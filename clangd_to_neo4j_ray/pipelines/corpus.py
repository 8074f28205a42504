"""Corpus-clean pipeline — the composed training-data workflow.

The canonical LLM-corpus preparation chain, built entirely from this
engine's operators and run as ONE streaming dataflow:

    exact dedup (md5 groups, min-doc_id representative)
      -> MinHash-LSH near-dup prune (greedy keep-lowest-doc_id)
      -> integer-exact quality filter (length + type/token ratio)

The reference analog is the staged build of
``clangd_graph_rag_builder.py:56-76`` (each pass consumes the previous
pass's survivors); the dedup stages are D1/D5 generalized to documents
(SURVEY §2.6) and the quality gate is the M17/M18 heuristic-filter family.

Near-dup semantics (deterministic, single-pass — the standard greedy LSH
dedup): a document is dropped iff some LSH candidate pair (a, b) with
a < b has BOTH endpoints surviving exact dedup and the document is b.
Chains are not re-evaluated after drops (b dropped for a does not
resurrect c dropped for b) — identical on the Ray and SQL sides.

Everything is bucketed-exchange joins on doc_id: no driver-side id sets,
no broadcast of O(corpus) keys — the chain runs at any corpus size.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.dedup import (
    _SQL_MINSIG, _SQL_SHINGLES3, _SQL_TOK, dedup_exact, dedup_minhash_pairs)
from ..stages.joins import bucketed_join
from ..stages.text import text_quality

MIN_TOKENS = 20  # drop the shortest ~10% of documents
TYPE_RATIO_PCT = 35  # keep docs with >= 35% distinct tokens (int-exact)


def corpus_clean(sf_dir: str) -> ray.data.Dataset:
    """Survivor documents with their quality stats.

    Output: (doc_id, n_tokens, n_types), unique on doc_id."""
    # reps fans out to three consumers (two semi joins + the anti join); a
    # lazy Dataset re-executes its whole lineage per consumer, so pin it
    # once (same rule as build_graph's shared intermediates).  It holds one
    # doc_id per unique document — ids only, object-store-resident and
    # spillable at any corpus size.
    reps = dedup_exact(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["rep_doc_id"]}), batch_format="pyarrow"
    ).materialize()
    pairs = dedup_minhash_pairs(sf_dir)
    # candidate pairs whose BOTH endpoints survived exact dedup
    p1 = bucketed_join(pairs, reps, on="a_doc", right_on="doc_id", how="semi")
    p2 = bucketed_join(p1, reps, on="b_doc", right_on="doc_id", how="semi")
    drop = p2.map_batches(
        lambda t: pa.table({"doc_id": t["b_doc"]}), batch_format="pyarrow"
    )
    # no standalone distinct: anti-join semantics ignore right-side
    # duplicates, and the per-bucket unique() combine keeps memory flat —
    # one exchange fewer
    survivors = bucketed_join(
        reps, drop, on="doc_id", how="anti",
        right_combine=lambda df: df.unique(),
    )
    quality = bucketed_join(
        text_quality(sf_dir), survivors, on="doc_id", how="semi"
    )

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t["n_tokens"], MIN_TOKENS),
            pc.greater_equal(
                pc.multiply(t["n_types"], pa.scalar(100, type=pa.int64())),
                pc.multiply(t["n_tokens"], pa.scalar(TYPE_RATIO_PCT, type=pa.int64())),
            ),
        )
        return t.filter(mask).select(["doc_id", "n_tokens", "n_types"])

    return quality.map_batches(keep, batch_format="pyarrow")


ORACLE_SQL: dict[str, str] = {
    "corpus_clean": f"""
WITH {_SQL_TOK}, {_SQL_SHINGLES3}, {_SQL_MINSIG},
reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
cand AS (
  SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
dropped AS (
  SELECT DISTINCT c.b_doc AS doc_id
  FROM cand c
  JOIN reps ra ON ra.doc_id = c.a_doc
  JOIN reps rb ON rb.doc_id = c.b_doc
),
surv AS (
  SELECT doc_id FROM reps
  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
),
q AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT tok) AS BIGINT) AS n_types
  FROM tok GROUP BY doc_id
)
SELECT q.doc_id, q.n_tokens, q.n_types
FROM q JOIN surv USING (doc_id)
WHERE q.n_tokens >= {MIN_TOKENS}
  AND 100 * q.n_types >= {TYPE_RATIO_PCT} * q.n_tokens
""",
}
