"""Flagship pipeline: pages Parquet -> knowledge graph (full build).

The Ray-Data re-expression of the reference's full build
(``clangd_graph_rag_builder.py:48-78``, SURVEY §3.1):

    read_parquet(pages)                        Pass 0/1: sources (S1-S6)
      -> extract_stage (map_batches)           byte-identical text per url
      -> link_scan_stage (actor pool, 1 pass)  Passes 2+6: spans + calls (J2-J4)
      -> canonicalize_triples (bucketed        Pass 4 + D1/D5: MERGE dedup
         two-phase groupby)
      -> entity/hierarchy nodes + edges        Passes 3-5: paths/symbols/includes
      -> write_graph (Parquet + Neo4j CSV +    K1/K2/K4 sinks + cache manifest
         manifest)

One linear dataflow, streaming end-to-end; the only all-to-all exchanges are
the bucketed canonicalization/dedup shuffles (stages/shuffle.py).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..functions.textops import prefixed
from ..sources.fixtures import EntityRecord
from ..stages.canonicalize import canonicalize_triples
from ..stages.extract import extract_stage
from ..stages.hierarchy import (
    domain_dataset,
    folder_dataset,
    hierarchy_edges,
    hierarchy_nodes,
)
from ..stages.linking import link_scan_stage, split_link_scan
from ..stages.shuffle import distinct


def graph_nodes_edges(
    pages_urls: ray.data.Dataset,
    mentions: ray.data.Dataset,
    triples: ray.data.Dataset,
    entity_names: dict[str, str],
):
    """Construct the (nodes, edges) datasets from pipeline intermediates.

    Shared by the in-memory full build and the checkpointed incremental
    build.  ``pages_urls`` needs only a ``url`` column; ``mentions`` needs
    (url, entity_id); ``triples`` is the canonicalized triple set."""
    names_ref = ray.put(entity_names)

    def _partial_entities(batch: pa.Table) -> pa.Table:
        return pa.table({"entity_id": pa.compute.unique(batch["entity_id"])})

    def _entity_rows(batch: pa.Table) -> pa.Table:
        names = ray.get(names_ref)
        ids = batch["entity_id"].to_pylist()
        return pa.table(
            {
                "node_id": pa.array([f"entity:{i}" for i in ids], type=pa.string()),
                "label": pa.repeat(pa.scalar("ENTITY"), len(ids)),
                "name": pa.array([names.get(i, i) for i in ids], type=pa.string()),
            }
        )

    # ENTITY nodes: distinct mentioned entities (orphan cleanup by
    # construction, A8) — per-batch partial distinct + bucketed distinct.
    entity_nodes = distinct(
        mentions.map_batches(_partial_entities, batch_format="pyarrow"),
        ["entity_id"],
    ).map_batches(_entity_rows, batch_format="pyarrow")

    domains = domain_dataset(pages_urls).materialize()  # small, shared
    folders = folder_dataset(pages_urls).materialize()  # small, shared
    nodes = hierarchy_nodes(pages_urls, domains, folders).union(entity_nodes)

    triple_edges = triples.map_batches(
        lambda t: pa.table(
            {
                "src": prefixed(t["subj"], "entity:"),
                "type": t["pred"],
                "dst": prefixed(t["obj"], "entity:"),
            }
        ),
        batch_format="pyarrow",
    )

    # MENTIONS edges: page -> entity, deduped (per-batch partial distinct +
    # bucketed distinct)
    def _partial_mention_edges(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "src": prefixed(batch["url"], "page:"),
                "dst": prefixed(batch["entity_id"], "entity:"),
            }
        )
        return t.group_by(["src", "dst"]).aggregate([]).rename_columns(["src", "dst"])

    mention_edges = distinct(
        mentions.map_batches(_partial_mention_edges, batch_format="pyarrow"),
        ["src", "dst"],
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "type": pa.repeat(pa.scalar("MENTIONS"), len(t)),
                "dst": t["dst"],
            }
        ),
        batch_format="pyarrow",
    )

    edges = (
        hierarchy_edges(pages_urls, domains, folders)
        .union(mention_edges)
        .union(triple_edges)
    )
    return nodes, edges


def build_graph_datasets(
    pages: ray.data.Dataset,
    alias_lut: dict[str, str],
    entity_names: dict[str, str],
    *,
    concurrency: int | tuple[int, int] | None = None,
):
    """Run the full build, returning (triples, mentions, nodes, edges)
    Datasets.

    ``alias_lut``: alias surface -> entity_id (broadcast once via ray.put).
    ``entity_names``: entity_id -> canonical name (for ENTITY node rows).
    """
    alias_ref = ray.put(alias_lut)
    # ``extracted`` and ``mentions`` fan out to several consumers; a lazy
    # Dataset re-executes its whole lineage per consumer, so pin each shared
    # intermediate once (the in-memory form of the per-stage checkpoint —
    # the S3/S8 cache analog; state/checkpoint.py is the durable form).
    extracted = extract_stage(pages).materialize()

    # one-pass link+mention scan (the hot dictionary stage runs exactly once)
    tagged = link_scan_stage(extracted, alias_ref, concurrency=concurrency).materialize()
    candidates, mentions = split_link_scan(tagged)
    triples = canonicalize_triples(candidates).materialize()
    mentions = mentions.materialize()

    nodes, edges = graph_nodes_edges(extracted, mentions, triples, entity_names)
    return triples, mentions, nodes, edges


def build_graph(
    pages_path: str,
    entities: list[EntityRecord],
    out_dir: str,
    *,
    concurrency: int | tuple[int, int] | None = None,
    write_neo4j_csv: bool = True,
    source_format: str = "parquet",
) -> dict:
    """End-to-end full build from a pages directory; returns manifest.

    ``source_format``: ``parquet`` (default) or ``warc`` — the latter
    ingests Common-Crawl-native WARC/1.0 files via ``sources.warc`` and
    derives text in the shared extract stage (same per-row invariant)."""
    from ..sources.fixtures import alias_lookup
    from ..stages.materialize import write_graph

    if source_format == "warc":
        from ..sources.warc import read_warc

        pages = read_warc(pages_path)
    else:
        pages = ray.data.read_parquet(pages_path)
    lut = alias_lookup(entities)
    names = {e.entity_id: e.canonical_name for e in entities}
    triples, mentions, nodes, edges = build_graph_datasets(
        pages, lut, names, concurrency=concurrency
    )
    manifest = write_graph(
        nodes,
        edges,
        out_dir,
        lineage={"input": pages_path, "format": source_format},
        write_neo4j_csv=write_neo4j_csv,
    )
    triples.write_parquet(f"{out_dir}/triples")
    manifest["outputs"]["triples"] = f"{out_dir}/triples"
    return manifest
