"""Sequence packing + per-group top-k — training-data batch-assembly
operators over the ``documents`` table.

Extends the LLM-pipeline operator family (round 3): after cleaning and
dedup, a training pipeline assembles documents into fixed-token-budget
sequences ("packing") and curates per-source subsets ("top-k per group").
Both are deterministic and integer-exact so they carry full DuckDB oracles.

Reference lineage: packing generalizes the reference's batched-ingest
planning (client batches sized by ``cypher_tx_size`` and the avg-group-size
aggregate, ``clangd_symbol_nodes_builder.py:290-307``, ``input_params.py:33-36``)
from "rows per transaction" to "tokens per training sequence"; top-k per
group is the A4 head-probe (``clangd_symbol_nodes_builder.py:290-307``)
turned into a curation operator.

Scale notes: both operators are one bucketed exchange keyed on ``source``
(the blocking key the whole dedup family already uses).  Packing is
order-dependent WITHIN a source by definition (prefix sums), so a source
must fit one reducer task — the same stated assumption as session windows;
top-k additionally pre-aggregates per batch (each batch contributes at most
k rows per source to the exchange), so its reducer input is bounded by
k x blocks regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .shuffle import bucketed_group_agg

PACK_BUDGET = 256  # tokens per packed training sequence (driver query)
TOP_K = 5  # docs kept per source (driver query)


def _doc_tokens(sf_dir: str) -> ray.data.Dataset:
    """(source, doc_id, n_tokens) — whitespace token counts, column-pruned
    read, one vectorized-ish pass (token semantics shared with
    text_quality / the corpus profile scan: ``string_split(text, ' ')``)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.add(
            pc.count_substring(batch["text"], pattern=" "), pa.scalar(1)
        )
        return pa.table(
            {
                "source": batch["source"],
                "doc_id": batch["doc_id"],
                "n_tokens": pc.cast(n, pa.int64()),
            }
        )

    return ds.map_batches(counts, batch_format="pyarrow")


def pack_sequences(
    sf_dir: str, *, budget: int = PACK_BUDGET
) -> ray.data.Dataset:
    """Assign every document to a fixed-token-budget training sequence.

    Sequential greedy fill per source: docs in doc_id order accumulate
    into the current pack until adding the next doc would exceed
    ``budget``, then a new pack opens (docs longer than the budget get
    their own pack).  Output: (source, doc_id, n_tokens, pack_id) with
    pack_id dense from 0 per source — deterministic and integer-exact;
    the DuckDB oracle replays the identical greedy recursion with a
    recursive CTE in doc_id order.
    """

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for src, grp in g.groupby("source", sort=False):
            grp = grp.sort_values("doc_id")
            toks = grp["n_tokens"].to_numpy(np.int64)
            pack_ids = np.empty(len(toks), dtype=np.int64)
            pid, acc = 0, 0
            for i, t in enumerate(toks):
                if acc and acc + t > budget:
                    pid += 1
                    acc = 0
                pack_ids[i] = pid
                acc += t
            out = grp.copy()
            out["pack_id"] = pack_ids
            outs.append(out)
        return pd.concat(outs, ignore_index=True) if outs else g.assign(
            pack_id=pd.Series([], dtype="int64")
        )

    return bucketed_group_agg(_doc_tokens(sf_dir), ["source"], pack)


def pack_stats(sf_dir: str, *, budget: int = PACK_BUDGET) -> ray.data.Dataset:
    """Per-source packing efficiency: sequence count and mean fill.

    Output: (source, n_packs, n_docs, sum_tokens) — the planning statistic
    a training job reads before deciding budget/shard counts (avg-group-
    size planning analog)."""
    from .shuffle import grouped_agg

    packed = pack_sequences(sf_dir, budget=budget)
    per_pack = grouped_agg(
        packed,
        ["source", "pack_id"],
        {"tok": ("n_tokens", "sum"), "nd": ("n_tokens", "size")},
    )
    return grouped_agg(
        per_pack,
        ["source"],
        {
            "n_packs": ("pack_id", "size"),
            "n_docs": ("nd", "sum"),
            "sum_tokens": ("tok", "sum"),
        },
    )


def grouped_head_n(
    ds: ray.data.Dataset,
    group_col: str,
    sort_cols: list[str],
    ascending: list[bool],
    n: int,
    out_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """First ``n`` rows per group under a total order — the bounded-reducer
    top-n plan shared by ``top_docs_per_source`` and
    ``sampling.sample_stratified``: per-batch partial head-n first (each
    block ships at most n rows per group into the exchange, so reducer
    input is bounded by n x blocks at any input size), then the identical
    head-n per group inside one bucketed exchange.  ``sort_cols`` must be
    a total order (include a unique tiebreaker) for determinism."""

    def head(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=ascending)
        out = df.groupby(group_col, sort=False).head(n)
        if out_cols is not None:
            out = out[out_cols]
        return out.reset_index(drop=True)

    partials = ds.map_batches(
        lambda t: pa.Table.from_pandas(head(t.to_pandas()), preserve_index=False),
        batch_format="pyarrow",
    )
    return bucketed_group_agg(partials, [group_col], head)


def top_docs_per_source(sf_dir: str, *, k: int = TOP_K) -> ray.data.Dataset:
    """The k longest documents of every source (curation top-k).

    Output: (source, doc_id, n_tokens), ties broken by ascending doc_id —
    fully deterministic, so the SQL oracle's row_number() ordering matches
    exactly.  Physical plan: ``grouped_head_n``."""
    return grouped_head_n(
        _doc_tokens(sf_dir),
        "source",
        ["source", "n_tokens", "doc_id"],
        [True, False, True],
        k,
    )


QUALITY_P = 0.1  # drop docs below the per-source 10th percentile of length


def quality_filter_p10(sf_dir: str) -> ray.data.Dataset:
    """Per-source percentile quality gate: keep docs whose token count is
    at least the source's 10th-percentile token count (discrete quantile,
    DuckDB ``quantile_disc`` rank rule: 0-indexed ceil(q*n)-1).

    Output: (source, doc_id, n_tokens).  Plan: ONE bucketed exchange —
    per-batch partial (source, n_tokens) histograms combine per source
    into the exact discrete quantile inside the bucket (the
    ``lineitem_quantiles`` value-count pattern, generalized per group);
    the resulting per-source thresholds are bounded by source cardinality
    (the family's stated blocking-key assumption) and broadcast into a
    vectorized filter — no second wide operation."""
    tok = _doc_tokens(sf_dir).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["source", "n_tokens"])
            .group_by(["source", "n_tokens"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "n_tokens", "cnt"])
        )

    def bucket_thresholds(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, grp in g.groupby("source", sort=False):
            grp = (
                grp.groupby("n_tokens", as_index=False)["cnt"].sum()
            ).sort_values("n_tokens")
            cnt = grp["cnt"].to_numpy(np.int64)
            n = int(cnt.sum())
            rank = max(int(np.ceil(QUALITY_P * n)) - 1, 0)
            cum = np.cumsum(cnt)
            val = grp["n_tokens"].to_numpy(np.int64)[
                np.searchsorted(cum, rank + 1)
            ]
            rows.append((src, int(val)))
        return pd.DataFrame(rows, columns=["source", "p10"])

    th = bucketed_group_agg(
        tok.map_batches(hist_partial, batch_format="pyarrow"),
        ["source"],
        bucket_thresholds,
    )
    p10 = {r["source"]: r["p10"] for r in th.take_all()}
    import ray as _ray

    ref = _ray.put(p10)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = _ray.get(ref)
        thr = pa.array(
            [m[s] for s in batch["source"].to_pylist()], type=pa.int64()
        )
        return batch.filter(pc.greater_equal(batch["n_tokens"], thr))

    return tok.map_batches(keep, batch_format="pyarrow")


def _pack_oracle(budget: int) -> str:
    # DuckDB has no native greedy-fill window; express the identical greedy
    # recursion per source with a recursive CTE over doc_id order.  Bounded
    # by docs-per-source on the oracle side only (the test corpus).
    return f"""
WITH RECURSIVE t AS (
  SELECT source, doc_id,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
packed(source, doc_id, n_tokens, rn, pack_id, acc) AS (
  SELECT source, doc_id, n_tokens, rn, CAST(0 AS BIGINT), n_tokens
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.doc_id, t.n_tokens, t.rn,
         CASE WHEN p.acc > 0 AND p.acc + t.n_tokens > {budget}
              THEN p.pack_id + 1 ELSE p.pack_id END,
         CASE WHEN p.acc > 0 AND p.acc + t.n_tokens > {budget}
              THEN t.n_tokens ELSE p.acc + t.n_tokens END
  FROM t JOIN packed p ON t.source = p.source AND t.rn = p.rn + 1
)
SELECT source, doc_id, n_tokens, pack_id FROM packed
"""


ORACLE_SQL: dict[str, str] = {
    "pack_sequences": _pack_oracle(PACK_BUDGET),
    "pack_stats": f"""
SELECT source, CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM ({_pack_oracle(PACK_BUDGET)}) packed GROUP BY source
""",
    "quality_filter_p10": f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
q AS (
  SELECT source, quantile_disc(n_tokens, {QUALITY_P}) AS p10
  FROM t GROUP BY source
)
SELECT t.source, t.doc_id, t.n_tokens
FROM t JOIN q USING (source)
WHERE t.n_tokens >= q.p10
""",
    "top_docs_per_source": f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (
           PARTITION BY source ORDER BY n_tokens DESC, doc_id) AS rn
  FROM t
)
SELECT source, doc_id, n_tokens FROM r WHERE rn <= {TOP_K}
""",
}
