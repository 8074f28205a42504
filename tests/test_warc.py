"""WARC source (sources/warc.py): Common-Crawl-native record ingestion.

Roundtrip-pinned: fixture pages serialized to WARC (plain + gzip) read
back byte-identical, and the extract stage derives the SAME text from the
WARC path as from the Parquet path (the input_hint per-row invariant,
carried across the source format)."""

from __future__ import annotations

import pyarrow as pa

from clangd_to_neo4j_ray.sources.fixtures import generate_pages
from clangd_to_neo4j_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    record_bytes,
    write_warc_files,
)
from clangd_to_neo4j_ray.stages.extract import extract_stage


def _fixture_pages(n: int = 120) -> pa.Table:
    return generate_pages(n).pages


def test_record_roundtrip_single():
    rec = record_bytes(
        "https://a.example.com/x", 1735689600000000, b"<p>hi</p>", "en"
    )
    t = parse_warc_bytes(rec)
    assert t["url"].to_pylist() == ["https://a.example.com/x"]
    assert t["html"].to_pylist() == [b"<p>hi</p>"]
    assert t["lang"].to_pylist() == ["en"]
    assert t["warc_ts"].cast(pa.int64()).to_pylist() == [1735689600000000]


def test_non_response_records_skipped_by_type():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://a/x\r\n"
        b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
        b"Content-Length: 3\r\n\r\nGET\r\n\r\n"
    )
    resp = record_bytes("https://a/y", 1735689600000000, b"<p>b</p>", "en")
    t = parse_warc_bytes(req + resp + req)
    assert t["url"].to_pylist() == ["https://a/y"]


def test_truncated_payload_raises():
    rec = record_bytes("https://a/x", 1735689600000000, b"0123456789", "en")
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(rec[:-6])  # cut into the payload


def test_warc_files_roundtrip_and_extract_parity(ray_session, tmp_path):
    pages = _fixture_pages()
    for compress in (False, True):
        d = tmp_path / ("gz" if compress else "plain")
        paths = write_warc_files(
            pages, str(d), num_files=4, compress=compress
        )
        assert len(paths) == 4
        ds = read_warc([str(p) for p in paths])
        got = (
            ds.to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        exp = (
            pages.select(["url", "warc_ts", "html", "lang"])
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert got["url"].tolist() == exp["url"].tolist()
        assert got["html"].tolist() == exp["html"].tolist()
        assert got["lang"].tolist() == exp["lang"].tolist()
        assert (
            got["warc_ts"].astype("int64").tolist()
            == exp["warc_ts"].astype("int64").tolist()
        )

        # input_hint per-row invariant across source formats: extract
        # derives byte-identical text from the WARC path
        warc_text = {
            r["url"]: r["text"]
            for r in extract_stage(read_warc([str(p) for p in paths])).take_all()
        }
        parquet_text = dict(
            zip(pages["url"].to_pylist(), pages["text"].to_pylist())
        )
        assert warc_text == parquet_text


def test_build_graph_from_warc_equals_parquet(ray_session, tmp_path):
    """End-to-end: the flagship KG build over WARC input emits the exact
    triple set of the Parquet path (same fixture, both formats)."""
    import pyarrow.parquet as pq

    from clangd_to_neo4j_ray.pipelines.build_graph import build_graph
    from clangd_to_neo4j_ray.sources.fixtures import generate_pages, make_entities

    fx = generate_pages(150)
    pq_dir = tmp_path / "pq"
    pq_dir.mkdir()
    pq.write_table(fx.pages, str(pq_dir / "part-0.parquet"))
    warc_dir = tmp_path / "warc"
    write_warc_files(fx.pages, str(warc_dir), num_files=3)

    ents = make_entities()
    m1 = build_graph(
        str(pq_dir), ents, str(tmp_path / "out_pq"), write_neo4j_csv=False
    )
    m2 = build_graph(
        str(warc_dir),
        ents,
        str(tmp_path / "out_warc"),
        write_neo4j_csv=False,
        source_format="warc",
    )

    def triples(out):
        import pyarrow.dataset as pads

        t = pads.dataset(f"{out}/triples").to_table()
        cols = ["subj_id", "pred", "obj_id"] if "subj_id" in t.column_names else sorted(t.column_names)
        return sorted(map(tuple, t.select(cols).to_pandas().itertuples(index=False)))

    assert triples(tmp_path / "out_warc") == triples(tmp_path / "out_pq")
    if "counts" in m1:
        assert m1["counts"] == m2["counts"]
