"""JSONL source/sink (sources/jsonl.py): roundtrip + query parity.

Pins that a query family runs identically off JSONL-ingested documents
as off the Parquet originals (format coverage for the S1/S2 analog)."""

from __future__ import annotations

import pyarrow.parquet as pq

from clangd_to_neo4j_ray.sources.jsonl import (
    read_jsonl_documents,
    write_jsonl_files,
)

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_plain_and_gz(ray_session, tmp_path):
    docs = pq.read_table(f"{SF}/documents.parquet")
    for compress in (False, True):
        d = tmp_path / ("gz" if compress else "plain")
        paths = write_jsonl_files(
            docs, str(d), num_files=3, compress=compress
        )
        assert len(paths) == 3
        got = (
            read_jsonl_documents([str(p) for p in paths])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = (
            docs.to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[got.columns]
        )
        assert got.equals(exp)


def test_jsonl_feeds_query_family_identically(ray_session, tmp_path):
    """text_quality over JSONL-ingested documents == over the Parquet
    originals: write the roundtripped table as the sf-dir's documents
    and compare row sets."""
    import pandas as pd
    import pyarrow as pa

    from clangd_to_neo4j_ray.stages.text import text_quality

    docs = pq.read_table(f"{SF}/documents.parquet")
    paths = write_jsonl_files(docs, str(tmp_path / "jl"), num_files=2)
    rt = read_jsonl_documents([str(p) for p in paths]).to_pandas()
    jl_dir = tmp_path / "sf"
    jl_dir.mkdir()
    pq.write_table(
        pa.Table.from_pandas(rt, preserve_index=False),
        str(jl_dir / "documents.parquet"),
    )

    a = text_quality(str(jl_dir)).to_pandas()
    b = text_quality(SF).to_pandas()
    key = sorted(a.columns)
    a = a[key].sort_values(key).reset_index(drop=True)
    b = b[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
