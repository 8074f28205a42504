"""Parity tests for the dedup operator family vs DuckDB oracles, plus a
planted-duplicate behavioral test for the near-dup path."""

from __future__ import annotations

import pandas as pd
import pytest

from clangd_to_neo4j_ray.stages import dedup

from .util import assert_matches_oracle

QUERIES = [
    ("dedup_exact", dedup.dedup_exact),
    ("minhash_signatures", dedup.minhash_signatures),
    ("dedup_minhash_pairs", dedup.dedup_minhash_pairs),
    ("dedup_simhash", dedup.dedup_simhash),
    ("dedup_ngram_jaccard", dedup.dedup_ngram_jaccard),
    ("dedup_embedding_pairs", dedup.dedup_embedding_pairs),
]


@pytest.mark.parametrize("name,fn", QUERIES, ids=[q[0] for q in QUERIES])
def test_dedup_matches_oracle(name, fn, sf_dir):
    assert_matches_oracle(fn(sf_dir), dedup.ORACLE_SQL[name], sf_dir)


def test_minhash_finds_planted_near_dups(tmp_path):
    """Plant near-duplicate documents; MinHash-LSH must bucket them."""
    base = (
        "spark join filter sort merge window batch stream value key data row "
        "column table query agg group hash scan vector part line customer"
    )
    near = base.replace("customer", "order")  # one token differs at the end
    other = "completely different words entirely unrelated content here now ok"
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [base, near, other],
            "source": ["s0", "s0", "s0"],
        }
    )
    path = str(tmp_path / "documents.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df), path)
    pairs = dedup.dedup_minhash_pairs(str(tmp_path)).take_all()
    assert {(p["a_doc"], p["b_doc"]) for p in pairs} == {(1, 2)}


def _brute_jaccard(df: pd.DataFrame) -> set:
    """Single-process all-pairs reference for the integer Jaccard predicate."""
    from clangd_to_neo4j_ray.stages.dedup import (
        JACCARD_DEN,
        JACCARD_NUM,
        _doc_shingles,
    )

    out = set()
    for src, g in df.groupby("source"):
        docs = sorted(zip(g["doc_id"], g["text"]))
        sets = [(d, _doc_shingles(t, 2)) for d, t in docs]
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                di, si = sets[i]
                dj, sj = sets[j]
                ni, nu = len(si & sj), len(si | sj)
                if ni >= 1 and JACCARD_DEN * ni >= JACCARD_NUM * nu:
                    out.add((di, dj, ni, nu))
    return out


def test_ngram_jaccard_skewed_block(tmp_path):
    """VERDICT r1 #6: the inverted-index plan must equal brute-force even
    when 80% of docs pile into ONE source (the skew case the old all-pairs
    implementation choked on)."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(100):
        src = "hot" if d < 80 else f"s{d % 5}"
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30)))
        rows.append((d, text, src))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))

    got = dedup.dedup_ngram_jaccard(str(tmp_path)).take_all()
    got_set = {
        (r["a_doc"], r["b_doc"], r["n_intersect"], r["n_union"]) for r in got
    }
    assert got_set == _brute_jaccard(df)
    assert len(got_set) > 50  # the hot block actually produces pairs


def test_embedding_pairs_chunked_equals_brute(tmp_path):
    """Chunk-grid streaming must equal the whole-label matmul."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clangd_to_neo4j_ray.stages.dedup import COSINE_DUP_THRESHOLD

    rng = np.random.RandomState(3)
    n, dim = 700, 16  # > EMBED_CHUNK so the grid has multiple cells
    m = rng.standard_normal((n, dim)).astype(np.float32)
    labels = rng.randint(0, 3, size=n).astype(np.int32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    got = dedup.dedup_embedding_pairs(str(tmp_path)).take_all()
    got_set = {(r["a_id"], r["b_id"]) for r in got}

    md = m.astype(np.float64)
    sims = (md @ md.T) / np.outer(
        np.linalg.norm(md, axis=1), np.linalg.norm(md, axis=1)
    )
    exp = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if labels[i] == labels[j] and sims[i, j] >= COSINE_DUP_THRESHOLD
    }
    assert got_set == exp
    assert len(got_set) > 0
