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
