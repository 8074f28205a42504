"""Mergeable cardinality sketches: HyperLogLog over corpus columns.

At 10^12 documents, "how many distinct tokens / URLs / entities does each
source contribute?" cannot afford an exact distinct (the exchange carries
every distinct value — `vocab_top_tokens` pays exactly that).  The
HyperLogLog register table is the classic mergeable answer: per-batch
partial registers are a FIXED-SIZE table (m buckets x sources), the
exchange is a max-merge over O(sources x m) rows no matter the corpus
size, and registers from disjoint shards merge by element-wise max — the
same partial/combine contract as every other exchange in this engine
(the reference analog is its counter accumulation A3, generalized to a
sublinear-state summary).

Determinism/exactness: the register construction (md5 -> bucket = first
byte, rho = leading-zero-bits of the next 60 bits + 1) is expressed as ONE
SQL fragment shared verbatim by the per-batch kernel and the DuckDB
oracle, so the sketch STATE is value-exact vs SQL — the correctness gate
checks the registers, not the (floating-point) estimate.  The estimate
itself (`hll_estimate`, with the standard small-range linear-counting
correction) is pinned against exact distinct counts in pytest.

Flajolet-Fusy-Gandouet-Meunier, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007 (public).
"""

from __future__ import annotations

import math

import pyarrow as pa
import ray.data

from ..functions.duck import sql_over

HLL_M = 256  # 2^8 buckets: first md5 byte

# toks(source, tok) -> reg(source, bucket, rho)  [shared verbatim w/ oracle]
HLL_REG_CTES = """hx AS (SELECT source, md5(tok) AS h FROM toks),
reg AS (
  SELECT source,
    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
    CAST(4 * length(regexp_extract(substr(h, 3, 15), '^(0*)', 1)) +
      CASE substr(regexp_replace(substr(h, 3, 15), '^0+', ''), 1, 1)
        WHEN '' THEN 1
        WHEN '1' THEN 4 WHEN '2' THEN 3 WHEN '3' THEN 3
        WHEN '4' THEN 2 WHEN '5' THEN 2 WHEN '6' THEN 2 WHEN '7' THEN 2
        ELSE 1 END AS BIGINT) AS rho
  FROM hx)"""

_REG_SELECT = """SELECT source, bucket, max(rho) AS rho_max
FROM reg GROUP BY source, bucket"""


def hll_partial_registers(toks: pa.Table) -> pa.Table:
    """One batch of (source, tok) rows -> sparse partial registers
    (source, bucket, rho_max).  Output is bounded by sources x m."""
    return sql_over(f"WITH {HLL_REG_CTES}\n{_REG_SELECT}", toks=toks)


def hll_vocab_registers(sf_dir: str) -> ray.data.Dataset:
    """Per-source vocabulary-cardinality HLL registers.

    Output: (source, bucket, rho_max) — the sparse register table (empty
    buckets omitted; both sides of the oracle compare agree on that
    representation).

    Plan: per-batch token explode + partial registers (bounded at
    sources x 256 rows PER BATCH regardless of batch size), then ONE
    bucketed exchange max-merging them — sketch state never grows with
    the corpus."""
    from .shuffle import grouped_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        return sql_over(
            f"""WITH toks AS (
              SELECT source, unnest(string_split(text, ' ')) AS tok FROM b),
            {HLL_REG_CTES}
            {_REG_SELECT}""",
            b=batch,
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "bucket"],
        {"rho_max": ("rho_max", "max")},
    )


def merge_registers(*tables: pa.Table) -> dict[tuple[str, int], int]:
    """Element-wise max-merge of sparse register tables (the HLL union)."""
    out: dict[tuple[str, int], int] = {}
    for t in tables:
        for r in t.to_pylist():
            k = (r["source"], r["bucket"])
            out[k] = max(out.get(k, 0), r["rho_max"])
    return out


def hll_estimate(registers: dict[int, int], m: int = HLL_M) -> float:
    """Standard HLL estimate over one source's registers {bucket: rho},
    with the small-range linear-counting correction (empty buckets counted
    as rho=0)."""
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -rho for rho in registers.values()) + (m - len(registers))
    est = alpha * m * m / s
    zeros = m - len(registers)
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est


# -- count-min sketch ---------------------------------------------------------
# Cormode-Muthukrishnan 2005: d row-salted hash rows x w buckets of COUNTS.
# Sum-mergeable (vs HLL's max-merge): per-batch partial registers add up in
# one exchange, giving frequency UPPER bounds (estimate = min over rows).

CMS_D = 4  # hash rows (salt 0..3)
CMS_W = 256  # buckets per row: first byte of the salted md5

# toks(source, tok) -> cms(source, row_id, bucket, cnt)  [shared w/ oracle]
CMS_REG_CTES = f"""salted AS (
  SELECT source,
         r.r AS row_id,
         md5(CAST(r.r AS VARCHAR) || ':' || tok) AS h
  FROM toks CROSS JOIN (VALUES (0), (1), (2), (3)) r(r)),
cms AS (
  SELECT source, row_id,
    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
    CAST(count(*) AS BIGINT) AS cnt
  FROM salted GROUP BY source, row_id, bucket)"""

_CMS_SELECT = "SELECT source, row_id, bucket, cnt FROM cms"


def cms_partial_registers(toks: pa.Table) -> pa.Table:
    """One batch of (source, tok) OCCURRENCE rows -> partial count-min
    registers (source, row_id, bucket, cnt); bounded at
    sources x d x w rows per batch."""
    return sql_over(f"WITH {CMS_REG_CTES}\n{_CMS_SELECT}", toks=toks)


def cms_token_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-source count-min sketch of token frequencies.

    Output: (source, row_id, bucket, cnt) — the sparse register table,
    value-exact vs the oracle (the construction SQL is shared verbatim).

    Plan: per-batch token explode + partial registers, ONE bucketed
    exchange SUMMING them — sketch state bounded at sources x d x w
    whatever the corpus size."""
    from .shuffle import grouped_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        return sql_over(
            f"""WITH toks AS (
              SELECT source, unnest(string_split(text, ' ')) AS tok FROM b),
            {CMS_REG_CTES}
            {_CMS_SELECT}""",
            b=batch,
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "row_id", "bucket"],
        {"cnt": ("cnt", "sum")},
    )


def cms_bucket(tok: str, row_id: int) -> int:
    """Python reference of the shared SQL bucket construction."""
    import hashlib

    h = hashlib.md5(f"{row_id}:{tok}".encode()).hexdigest()
    return int(h[:2], 16)


def cms_estimate(
    registers: dict[tuple[int, int], int], tok: str, d: int = CMS_D
) -> int:
    """Point frequency estimate for one source's registers
    {(row_id, bucket): cnt}: min over rows (missing bucket = 0)."""
    return min(
        registers.get((r, cms_bucket(tok, r)), 0) for r in range(d)
    )


ORACLE_SQL: dict[str, str] = {
    "hll_vocab_registers": f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
{HLL_REG_CTES}
{_REG_SELECT}
""",
    "cms_token_counts": f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
{CMS_REG_CTES}
{_CMS_SELECT}
""",
}
