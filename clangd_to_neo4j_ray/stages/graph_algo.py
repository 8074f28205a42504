"""Graph algorithms over the materialized edge table.

J7/J8 analogs (``include_relation_provider.py:69-133``,
``tools/find_impacted_sources.py``): transitive closure / reachability as an
iterative loop of broadcast semi-joins — frontier ⋈ edges until fixpoint.
The reference needs this for header-impact analysis (which sources
transitively include a changed header); the web analog is link/co-occurrence
reachability from seed entities.

Also the A4-analog head-key probe (``clangd_symbol_nodes_builder.py:290-307``):
per-key mention counts, descending — the statistic that drives salting /
bucket-count decisions for skewed keys.

The BFS loop is a driver loop over *datasets* (each hop a distributed
semi-join); the frontier itself is assumed small enough to broadcast — the
same assumption the reference makes (its dirty-header set is small).  For a
frontier that outgrows broadcast, swap the semi-join for the bucketed
``hash_join`` (stages/joins.py); the loop shape is unchanged.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def reachable_from(
    edges: ray.data.Dataset,
    seeds: set[str],
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 25,
) -> dict[str, int]:
    """BFS reachability: node -> hop distance (seeds at 0).

    Each hop: filter the edge dataset to rows whose src is in the frontier
    (vectorized broadcast semi-join), collect the distinct dsts (small), and
    extend the visited set.  Terminates at fixpoint or max_hops.
    """
    visited: dict[str, int] = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, max_hops + 1):
        if not frontier:
            break
        fr_arr = ray.put(pa.array(sorted(frontier)))

        def step(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[src_col], value_set=ray.get(fr_arr))
            hits = batch.filter(mask)
            return pa.table({"dst": pc.unique(hits[dst_col])})

        nexts = edges.map_batches(step, batch_format="pyarrow").take_all()
        frontier = {r["dst"] for r in nexts} - set(visited)
        for n in frontier:
            visited[n] = hop
    return visited


def kg_reachability(sf_dir: str) -> pa.Table:
    """Driver query: entities reachable from the head entity 'data' via
    co-occurrence edges, with hop distance.

    Output: (name, hops) — deterministic BFS over the deduped directed
    co-occurrence triple set.  Oracle: recursive CTE in DuckDB.
    """
    from ..pipelines.docs_kg import kg_triples

    triples = kg_triples(sf_dir).select_columns(["subj_name", "obj_name"])
    dist = reachable_from(triples, {"data"}, src_col="subj_name", dst_col="obj_name")
    names = sorted(dist)
    return pa.table(
        {
            "name": pa.array(names, type=pa.string()),
            "hops": pa.array([dist[n] for n in names], type=pa.int64()),
        }
    )


def prune_orphans_to_fixpoint(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    *,
    protect: set[str] | None = None,
    max_rounds: int = 20,
):
    """A8+A9 analog: iteratively delete nodes with no incident edges, then
    edges whose endpoints vanished, until fixpoint (the reference loops
    DELETE-empty-FOLDER until none remain, ``neo4j_manager.py:144-161``).

    The loop is driver-side but every round's work is distributed: incident
    endpoints come from a bucketed distinct (per-batch pre-dedup), and both
    the node keep and the edge endpoint checks are bucketed semi-joins — no
    edge or node id set ever lands on the driver (VERDICT r1 #9).  Returns
    (nodes, edges) as materialized Datasets.
    """
    from .joins import bucketed_join
    from .shuffle import distinct

    protect = sorted(protect or set())
    for _ in range(max_rounds):
        endpoints = edges.map_batches(
            lambda t: pa.table(
                {
                    "node_id": pa.concat_arrays(
                        [
                            pc.unique(t["src"].combine_chunks()),
                            pc.unique(t["dst"].combine_chunks()),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        if protect:
            endpoints = endpoints.union(
                ray.data.from_arrow(
                    pa.table({"node_id": pa.array(protect, type=pa.string())})
                )
            )
        keep = distinct(endpoints, ["node_id"])
        pruned = bucketed_join(nodes, keep, on="node_id", how="semi").materialize()
        if pruned.count() == nodes.count():
            return pruned, edges
        nodes = pruned
        node_ids = nodes.select_columns(["node_id"])
        edges = bucketed_join(
            bucketed_join(edges, node_ids, on="src", right_on="node_id", how="semi"),
            node_ids,
            on="dst",
            right_on="node_id",
            how="semi",
        ).materialize()
    return nodes, edges


def kg_head_entities(sf_dir: str):
    """A4-analog skew probe as a driver query: top-10 entities by total
    mention count (the salting-decision statistic).

    Output: (name, n_mentions), deterministic order baked into values by
    limiting to 10 with (count desc, name asc) tie-break."""
    from ..pipelines.docs_kg import kg_entity_nodes

    ds = kg_entity_nodes(sf_dir).select_columns(["name", "n_mentions"])
    return ds.sort(["n_mentions", "name"], descending=[True, False]).limit(10)


ORACLE_SQL: dict[str, str] = {
    "kg_reachability": """
WITH RECURSIVE
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        generate_subscripts(string_split(text, ' '), 1) AS i FROM documents),
{VOCAB},
pairs AS (
  SELECT DISTINCT a.tok AS w1, b.tok AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.tok IN (SELECT name FROM vocab) AND b.tok IN (SELECT name FROM vocab)
),
reach(name, hops) AS (
  SELECT 'data', 0
  UNION
  SELECT p.w2, r.hops + 1
  FROM reach r JOIN pairs p ON p.w1 = r.name
  WHERE r.hops < 25
)
SELECT name, CAST(min(hops) AS BIGINT) AS hops FROM reach GROUP BY name
""",
    "kg_head_entities": """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
{VOCAB}
SELECT t.tok AS name, CAST(count(*) AS BIGINT) AS n_mentions
FROM tok t JOIN vocab v ON t.tok = v.name
GROUP BY t.tok
ORDER BY n_mentions DESC, name
LIMIT 10
""",
}


def _fill_vocab() -> None:
    from ..pipelines.docs_kg import SQL_VOCAB

    for k in list(ORACLE_SQL):
        ORACLE_SQL[k] = ORACLE_SQL[k].replace("{VOCAB}", SQL_VOCAB)


_fill_vocab()
