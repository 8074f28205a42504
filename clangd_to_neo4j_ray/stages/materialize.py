"""Stage W: graph materialization — node/edge Parquet + Neo4j bulk CSV + manifest.

The sink family replacing the reference's live-Neo4j ingest (K1/K2/K4,
``clangd_symbol_nodes_builder.py:148-382``, ``neo4j_manager.py:180-205``):

- ``nodes/`` and ``edges/`` Parquet directories (partitioned part files —
  resumable layout, never one giant file);
- Neo4j **bulk-import** CSVs with ``:ID/:LABEL`` and ``:START_ID/:TYPE/:END_ID``
  headers (``neo4j-admin database import`` format) — MERGE idempotency is
  guaranteed upstream by canonicalization, so the offline bulk path needs no
  live DB;
- ``manifest.json`` per run: lineage (input fingerprint) + per-stage metrics,
  the pickle-cache/commit-stamp analog (S3/S8,
  ``clangd_index_yaml_parser.py:136-192``, ``compilation_manager.py:27-94``).

Writes go to a temp dir then rename — atomic publish per partition.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

NEO4J_NODE_HEADER = {"node_id": "node_id:ID", "label": ":LABEL", "name": "name"}
NEO4J_EDGE_HEADER = {"src": ":START_ID", "type": ":TYPE", "dst": ":END_ID"}


def write_graph(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    out_dir: str,
    *,
    lineage: dict | None = None,
    write_neo4j_csv: bool = True,
) -> dict:
    """Write nodes/edges Parquet (+ optional Neo4j bulk CSVs) + manifest.

    Returns the manifest dict.  Output layout::

        out_dir/nodes/*.parquet
        out_dir/edges/*.parquet
        out_dir/neo4j/nodes_*.csv  edges_*.csv
        out_dir/manifest.json
    """
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.perf_counter()
    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")
    nodes.write_parquet(nodes_dir)
    t1 = time.perf_counter()
    edges.write_parquet(edges_dir)
    t2 = time.perf_counter()

    # An empty dataset may write no files at all; keep the layout present so
    # downstream read_parquet / resume logic never hits a missing directory.
    os.makedirs(nodes_dir, exist_ok=True)
    os.makedirs(edges_dir, exist_ok=True)
    n_nodes = _count_parquet_dir(nodes_dir)
    n_edges = _count_parquet_dir(edges_dir)

    csv_files: list[str] = []
    if write_neo4j_csv and n_nodes:
        csv_files = write_neo4j_bulk_csv(
            ray.data.read_parquet(nodes_dir),
            ray.data.read_parquet(edges_dir),
            os.path.join(out_dir, "neo4j"),
        )

    # per-stage execution stats (A3 counter-accumulation analog): Ray Data's
    # stage breakdown for the node/edge writes, kept as text for inspection
    def _stats_of(ds: ray.data.Dataset) -> str:
        try:
            return ds.stats()[:4000]
        except Exception:
            return ""

    manifest = {
        "lineage": lineage or {},
        "stages": {
            "write_nodes": {
                "rows": n_nodes,
                "wall_sec": round(t1 - t0, 4),
                "ray_stats": _stats_of(nodes),
            },
            "write_edges": {
                "rows": n_edges,
                "wall_sec": round(t2 - t1, 4),
                "ray_stats": _stats_of(edges),
            },
        },
        "outputs": {
            "nodes": nodes_dir,
            "edges": edges_dir,
            "neo4j_csv": csv_files,
        },
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def _count_parquet_dir(path: str) -> int:
    """Metadata-only row count of a Parquet directory (no data read)."""
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(path, "*.parquet"))
    )


def write_neo4j_bulk_csv(
    nodes: ray.data.Dataset, edges: ray.data.Dataset, csv_dir: str
) -> list[str]:
    """Per-label node CSVs + per-type edge CSVs, bulk-import headers,
    deterministic sort within each file (O4 stable-dump analog,
    ``compilation_parser.py:258-264``).

    One writer per label/type partition = single-writer-per-partition, the
    isolated-parallel strategy analog (K2,
    ``clangd_symbol_nodes_builder.py:259-333``) with file-level isolation.
    """
    os.makedirs(csv_dir, exist_ok=True)
    written: list[str] = []

    labels = [r["label"] for r in nodes.groupby("label").count().take_all()]
    for label in sorted(labels):
        part = nodes.map_batches(
            lambda t, lab=label: t.filter(pc.equal(t["label"], lab)),
            batch_format="pyarrow",
        )
        tbl = _resolve_arrow_refs(part)
        tbl = tbl.sort_by("node_id")
        tbl = tbl.rename_columns(
            [NEO4J_NODE_HEADER.get(c, c) for c in tbl.column_names]
        )
        path = os.path.join(csv_dir, f"nodes_{label}.csv")
        _write_csv_atomic(tbl, path)
        written.append(path)

    types = [r["type"] for r in edges.groupby("type").count().take_all()]
    for etype in sorted(types):
        part = edges.map_batches(
            lambda t, et=etype: t.filter(pc.equal(t["type"], et)),
            batch_format="pyarrow",
        )
        tbl = _resolve_arrow_refs(part)
        tbl = tbl.sort_by([("src", "ascending"), ("dst", "ascending")])
        tbl = tbl.rename_columns(
            [NEO4J_EDGE_HEADER.get(c, c) for c in tbl.column_names]
        )
        safe = etype.replace("/", "_")
        path = os.path.join(csv_dir, f"edges_{safe}.csv")
        _write_csv_atomic(tbl, path)
        written.append(path)
    return written


def _write_csv_atomic(tbl: pa.Table, path: str) -> None:
    import pyarrow.csv as pacsv

    tmp = path + ".tmp"
    pacsv.write_csv(tbl, tmp)
    os.replace(tmp, path)


def _resolve_arrow_refs(ds: ray.data.Dataset) -> pa.Table:
    """Materialize a (small) dataset to one Arrow table on the driver."""
    import ray as _ray

    tables = _ray.get(ds.to_arrow_refs())
    tables = [t for t in tables if t.num_rows] or tables[:1]
    return pa.concat_tables(tables, promote_options="default")


def validate_graph(out_dir: str) -> dict:
    """Graph invariants (FIXTURES.md F5): node_id unique; edge endpoints
    exist in nodes; no orphan nodes (A8 anti-join,
    ``neo4j_manager.py:124-128``).  Returns violation counts.  Test-scale
    validation utility (materializes id columns on the driver); the
    at-scale path is the same anti-join expressed as a groupby."""
    nodes = ray.data.read_parquet(os.path.join(out_dir, "nodes"))
    edges = ray.data.read_parquet(os.path.join(out_dir, "edges"))
    node_tbl = _resolve_arrow_refs(nodes.select_columns(["node_id"]))
    edge_tbl = _resolve_arrow_refs(edges.select_columns(["src", "dst"]))
    ids = node_tbl["node_id"].to_pylist()
    id_set = set(ids)
    srcs = edge_tbl["src"].to_pylist()
    dsts = edge_tbl["dst"].to_pylist()
    endpoint_set = set(srcs) | set(dsts)
    return {
        "duplicate_node_ids": len(ids) - len(id_set),
        "dangling_edges": sum(1 for x in srcs if x not in id_set)
        + sum(1 for x in dsts if x not in id_set),
        "orphan_nodes": len(id_set - endpoint_set),
    }
