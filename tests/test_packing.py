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
