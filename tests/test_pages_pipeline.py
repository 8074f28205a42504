"""Flagship pages-pipeline tests: byte-identical extract, mention spans,
triple P/R vs the planted set AND the independent single-process oracle,
graph materialization invariants."""

from __future__ import annotations

import pytest
import ray.data

from clangd_to_neo4j_ray.oracle import oracle_triples, precision_recall
from clangd_to_neo4j_ray.pipelines.build_graph import build_graph, build_graph_datasets
from clangd_to_neo4j_ray.sources.fixtures import (
    alias_lookup,
    generate_pages,
    write_pages_fixture,
)
from clangd_to_neo4j_ray.stages.extract import extract_stage
from clangd_to_neo4j_ray.stages.materialize import validate_graph


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    fx = generate_pages(300)
    out = tmp_path_factory.mktemp("pages")
    write_pages_fixture(fx, str(out), num_files=8)
    return fx, str(out)


def test_extract_byte_identical(fixture):
    """BASELINE.json input_hint per-row invariant."""
    fx, path = fixture
    pages = ray.data.read_parquet(path)
    got = {r["url"]: r["text"] for r in extract_stage(pages).take_all()}
    expected = dict(
        zip(fx.pages["url"].to_pylist(), fx.pages["text"].to_pylist())
    )
    assert got == expected  # byte-identical per url


def test_documents_adapter_routes_through_extract():
    """documents_as_pages output (no html column) must pass unchanged
    through the extract stage (ADVICE r1: the all-null html column crashed
    the documented smoke-run path)."""
    from clangd_to_neo4j_ray.sources.pages import documents_as_pages

    ds = documents_as_pages("/root/testdata/sf0.001")
    out = extract_stage(ds).take(5)
    assert all(r["text"] for r in out)
    assert all(r["url"].startswith("https://") for r in out)


def test_mention_spans_match_planted(fixture):
    fx, path = fixture
    from clangd_to_neo4j_ray.stages.linking import mention_stage
    import ray as _ray

    pages = ray.data.read_parquet(path)
    lut = alias_lookup(fx.entities)
    ds = mention_stage(extract_stage(pages), _ray.put(lut))
    got = {
        (r["url"], r["entity_id"], r["surface"], r["start"], r["end"])
        for r in ds.take_all()
    }
    exp_tbl = fx.oracle_mentions
    expected = set(
        zip(
            exp_tbl["url"].to_pylist(),
            exp_tbl["entity_id"].to_pylist(),
            exp_tbl["surface"].to_pylist(),
            exp_tbl["start"].to_pylist(),
            exp_tbl["end"].to_pylist(),
        )
    )
    assert got == expected


def test_triple_pr_vs_planted_and_oracle(fixture):
    fx, path = fixture
    pages = ray.data.read_parquet(path)
    lut = alias_lookup(fx.entities)
    names = {e.entity_id: e.canonical_name for e in fx.entities}
    triples, _m, _n, _e = build_graph_datasets(pages, lut, names)
    rows = triples.take_all()
    got = {(r["subj"], r["pred"], r["obj"]) for r in rows}

    # vs generator-planted set
    p, r = precision_recall(got, fx.oracle_triples)
    assert p >= 0.95 and r >= 0.95, (p, r)

    # vs independent single-process oracle implementation
    page_rows = fx.pages.select(["url", "html"]).to_pylist()
    expected = oracle_triples(page_rows, fx.entities)
    p2, r2 = precision_recall(got, set(expected))
    assert p2 >= 0.95 and r2 >= 0.95, (p2, r2)

    # deterministic min-url evidence witness (D5 analog)
    ev = {(r["subj"], r["pred"], r["obj"]): r["evidence_url"] for r in rows}
    for t, url in expected.items():
        if t in ev:
            assert ev[t] == url


def test_build_graph_materialize(fixture, tmp_path):
    fx, path = fixture
    out = str(tmp_path / "graph")
    manifest = build_graph(path, fx.entities, out)
    assert manifest["stages"]["write_nodes"]["rows"] > 0
    assert manifest["stages"]["write_edges"]["rows"] > 0

    v = validate_graph(out)
    assert v["duplicate_node_ids"] == 0
    assert v["dangling_edges"] == 0
    # PROJECT node contains everything; only it may be orphan-free root —
    # every node participates in some edge by construction
    assert v["orphan_nodes"] == 0

    import os

    csvs = os.listdir(os.path.join(out, "neo4j"))
    assert any(c.startswith("nodes_PAGE") for c in csvs)
    assert any(c.startswith("edges_CONTAINS") for c in csvs)
    # per-label dir: header.csv + headerless sorted part files
    page_dir = os.path.join(out, "neo4j", "nodes_PAGE")
    with open(os.path.join(page_dir, "header.csv")) as f:
        header = f.readline()
    assert ":ID" in header and ":LABEL" in header
    parts = [p for p in os.listdir(page_dir) if p.startswith("part-")]
    assert parts


def test_build_graph_rerun_same_outdir(fixture, tmp_path):
    """Re-running into the SAME --out must not accumulate stale part files
    (ADVICE r1: write_parquet appends by default)."""
    fx, path = fixture
    out = str(tmp_path / "graph")
    m1 = build_graph(path, fx.entities, out)
    m2 = build_graph(path, fx.entities, out)
    assert (
        m2["stages"]["write_nodes"]["rows"]
        == m1["stages"]["write_nodes"]["rows"]
    )
    assert (
        m2["stages"]["write_edges"]["rows"]
        == m1["stages"]["write_edges"]["rows"]
    )
    v = validate_graph(out)
    assert v["duplicate_node_ids"] == 0 and v["dangling_edges"] == 0


def test_csv_sink_three_strategies_equivalent(tmp_path):
    """K2: batched-parallel / isolated-parallel / unwind-sequential must
    produce identical per-partition row multisets; the non-batched ones
    additionally produce one globally sorted file per partition."""
    import os

    import pyarrow as pa

    from clangd_to_neo4j_ray.stages.materialize import (
        INGEST_STRATEGIES,
        write_neo4j_bulk_csv,
    )

    n = 600
    nodes = ray.data.from_arrow(
        pa.table(
            {
                "node_id": [f"n{i:04d}" for i in range(n)],
                "label": ["PAGE" if i % 3 else "SITE" for i in range(n)],
                "name": [f"nm{i}" for i in range(n)],
            }
        )
    ).repartition(8)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": [f"n{i:04d}" for i in range(n - 1)],
                "type": ["LINKS"] * (n - 1),
                "dst": [f"n{i + 1:04d}" for i in range(n - 1)],
            }
        )
    ).repartition(8)

    contents = {}
    for strat in INGEST_STRATEGIES:
        d = str(tmp_path / strat)
        written = write_neo4j_bulk_csv(nodes, edges, d, strategy=strat)
        rows = {}
        for p in written:
            part_dir = os.path.basename(os.path.dirname(p))
            with open(p) as f:
                rows.setdefault(part_dir, []).extend(
                    line for line in f if line.strip()
                )
        contents[strat] = {k: sorted(v) for k, v in rows.items()}
        if strat != "batched-parallel":  # single sorted file per partition
            for p in written:
                with open(p) as f:
                    lines = [line for line in f]
                assert lines == sorted(lines), p
    assert contents["batched-parallel"] == contents["isolated-parallel"]
    assert contents["batched-parallel"] == contents["unwind-sequential"]


def test_csv_sink_streams_multipart(tmp_path):
    """The bulk-CSV sink must never concatenate a label partition: a
    many-block hot label comes out as MULTIPLE sorted part files whose
    union is exactly the input."""
    import os

    import pyarrow as pa

    from clangd_to_neo4j_ray.stages.materialize import write_neo4j_bulk_csv

    n = 5000
    nodes = ray.data.from_arrow(
        pa.table(
            {
                "node_id": [f"n{i:05d}" for i in range(n)],
                "label": ["PAGE"] * (n - 5) + ["SITE"] * 5,
                "name": [f"name{i}" for i in range(n)],
            }
        )
    ).repartition(16)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": [f"n{i:05d}" for i in range(n - 1)],
                "type": ["LINKS"] * (n - 1),
                "dst": [f"n{i + 1:05d}" for i in range(n - 1)],
            }
        )
    ).repartition(16)
    csv_dir = str(tmp_path / "neo4j")
    written = write_neo4j_bulk_csv(nodes, edges, csv_dir)
    page_parts = [p for p in written if "/nodes_PAGE/" in p]
    assert len(page_parts) > 1, "hot label must stream as multiple parts"
    rows = []
    for p in page_parts:
        with open(p) as f:
            rows += [line.split(",")[0].strip('"') for line in f if line.strip()]
    assert sorted(rows) == [f"n{i:05d}" for i in range(n - 5)]
    # each part is internally sorted (distributed sort upstream)
    with open(sorted(page_parts)[0]) as f:
        ids = [line.split(",")[0] for line in f]
    assert ids == sorted(ids)


def test_csv_sink_emits_schema_and_import_artifacts(tmp_path):
    """VERDICT r2 #5: the bulk-CSV sink must complete the offline-import
    story — schema.cypher lists a uniqueness constraint and a vector index
    for EVERY node label written (neo4j_manager.py:45-54, 224-239 analog),
    and import.sh names every node/edge partition directory."""
    import os

    import pyarrow as pa

    from clangd_to_neo4j_ray.stages.materialize import write_neo4j_bulk_csv

    nodes = ray.data.from_arrow(
        pa.table(
            {
                "node_id": ["a", "b", "c", "d"],
                "label": ["PAGE", "SITE", "PAGE", "ODD/LBL"],
                "name": ["1", "2", "3", "4"],
            }
        )
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": ["a", "b"],
                "type": ["LINKS", "MENTIONS"],
                "dst": ["b", "c"],
            }
        )
    )
    d = str(tmp_path / "neo4j")
    write_neo4j_bulk_csv(nodes, edges, d)
    schema = open(os.path.join(d, "schema.cypher")).read()
    for label in ("PAGE", "SITE", "ODD/LBL"):
        assert f"FOR (n:`{label}`) REQUIRE n.node_id IS UNIQUE" in schema
        assert f"FOR (n:`{label}`) ON (n.summaryEmbedding)" in schema
    assert "vector.similarity_function`: 'cosine'" in schema
    sh = open(os.path.join(d, "import.sh")).read()
    assert "neo4j-admin database import full" in sh
    for part in ("nodes_PAGE", "nodes_SITE", "nodes_ODD%2FLBL",
                 "edges_LINKS", "edges_MENTIONS"):
        assert part in sh, part
        assert os.path.isdir(os.path.join(d, part))
    assert os.access(os.path.join(d, "import.sh"), os.X_OK)
