"""Flagship pipeline: pages Parquet -> knowledge graph (full build).

The Ray-Data re-expression of the reference's full build
(``clangd_graph_rag_builder.py:48-78``, SURVEY §3.1):

    read_parquet(pages)                        Pass 0/1: sources (S1-S6)
      -> extract_stage (map_batches)           byte-identical text per url
      -> link_stage (EntityLinker actor pool)  Passes 2+6: spans + calls (J2-J4)
      -> canonicalize_triples (salted 2-phase  Pass 4 + D1/D5: MERGE dedup
         groupby)
      -> entity/hierarchy nodes + edges        Passes 3-5: paths/symbols/includes
      -> write_graph (Parquet + Neo4j CSV +    K1/K2/K4 sinks + cache manifest
         manifest)

One linear dataflow, streaming end-to-end; the only all-to-all exchanges are
the canonicalization groupbys.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..sources.fixtures import EntityRecord
from ..stages.canonicalize import canonicalize_triples
from ..stages.extract import extract_stage
from ..stages.hierarchy import hierarchy_edges, hierarchy_nodes
from ..stages.linking import link_stage, mention_stage


def build_graph_datasets(
    pages: ray.data.Dataset,
    alias_lut: dict[str, str],
    entity_names: dict[str, str],
    *,
    concurrency: int | tuple[int, int] | None = None,
):
    """Run the full build, returning (triples, mentions, nodes, edges)
    lazy Datasets.

    ``alias_lut``: alias surface -> entity_id (broadcast once via ray.put).
    ``entity_names``: entity_id -> canonical name (for ENTITY node rows).
    """
    alias_ref = ray.put(alias_lut)
    # ``extracted`` and ``mentions`` fan out to several consumers; a lazy
    # Dataset re-executes its whole lineage per consumer, so pin each shared
    # intermediate once (the in-memory form of the per-stage checkpoint —
    # the S3/S8 cache analog; state/checkpoint.py is the durable form).
    extracted = extract_stage(pages).materialize()

    candidates = link_stage(extracted, alias_ref, concurrency=concurrency)
    triples = canonicalize_triples(candidates).materialize()
    mentions = mention_stage(extracted, alias_ref, concurrency=concurrency).materialize()

    # ENTITY nodes: distinct mentioned entities (orphan cleanup by
    # construction, A8) — two-phase distinct on entity_id.
    def _partial_entities(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["entity_id"])
            .group_by("entity_id")
            .aggregate([([], "count_all")])
            .rename_columns(["entity_id", "n"])
        )

    names_ref = ray.put(entity_names)

    class EntityNodeBuilder:
        def __init__(self, ref):
            self.names: dict[str, str] = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["entity_id"].to_pylist()
            return pa.table(
                {
                    "node_id": pa.array([f"entity:{i}" for i in ids], type=pa.string()),
                    "label": pa.array(["ENTITY"] * len(ids), type=pa.string()),
                    "name": pa.array(
                        [self.names.get(i, i) for i in ids], type=pa.string()
                    ),
                }
            )

    entity_nodes = (
        mentions.map_batches(_partial_entities, batch_format="pyarrow")
        .groupby("entity_id")
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            EntityNodeBuilder,
            fn_constructor_args=(names_ref,),
            batch_format="pyarrow",
            concurrency=2,
        )
    )

    nodes = hierarchy_nodes(extracted).union(entity_nodes)

    triple_edges = triples.map_batches(
        lambda t: pa.table(
            {
                "src": pa.array(
                    [f"entity:{s}" for s in t["subj"].to_pylist()], type=pa.string()
                ),
                "type": t["pred"],
                "dst": pa.array(
                    [f"entity:{o}" for o in t["obj"].to_pylist()], type=pa.string()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    # MENTIONS edges: page -> entity, deduped (two-phase)
    def _partial_mention_edges(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "src": pa.array(
                    [f"page:{u}" for u in batch["url"].to_pylist()], type=pa.string()
                ),
                "dst": pa.array(
                    [f"entity:{e}" for e in batch["entity_id"].to_pylist()],
                    type=pa.string(),
                ),
            }
        )
        return t.group_by(["src", "dst"]).aggregate([([], "count_all")]).rename_columns(
            ["src", "dst", "n"]
        )

    mention_edges = (
        mentions.map_batches(_partial_mention_edges, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Min(on="n", alias_name="_n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "type": pa.array(["MENTIONS"] * len(t), type=pa.string()),
                    "dst": t["dst"],
                }
            ),
            batch_format="pyarrow",
        )
    )

    edges = hierarchy_edges(extracted).union(mention_edges).union(triple_edges)
    return triples, mentions, nodes, edges


def build_graph(
    pages_path: str,
    entities: list[EntityRecord],
    out_dir: str,
    *,
    concurrency: int | tuple[int, int] | None = None,
    write_neo4j_csv: bool = True,
) -> dict:
    """End-to-end full build from a pages Parquet directory; returns manifest."""
    from ..sources.fixtures import alias_lookup
    from ..stages.materialize import write_graph

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
        lineage={"input": pages_path},
        write_neo4j_csv=write_neo4j_csv,
    )
    triples.write_parquet(f"{out_dir}/triples")
    manifest["outputs"]["triples"] = f"{out_dir}/triples"
    return manifest
