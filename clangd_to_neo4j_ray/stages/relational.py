"""Relational operator coverage over the TPC-H-ish tables.

Demonstrates the general-purpose operator surface (grouped aggregates,
multi-way joins, semi/anti joins, top-k, window ranks) that the KG pipeline
stages build on, each with an exact DuckDB oracle.  Reference analogs:
grouped aggregates = A1/A2; anti-join = A8 orphan cleanup; per-key ranking =
O1/O2 ordering semantics.

Join strategy notes (SURVEY §7.4): dimension sides (nation, customer, part,
filtered orders) are broadcast; the fact table (lineitem) always streams.
At 100 TB the broadcast sides here (customer at 1.5M rows/SF) would move to
``hash_join``; the choice is isolated in this module.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..functions.numerics import round_col, round_half_away
from .joins import broadcast_semi_join, bucketed_join
from .shuffle import bucketed_group_agg, grouped_sum

Q1_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"
TOP_PARTS_K = 10


def _read(sf_dir: str, table: str, cols: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=cols)


def _small_df(sf_dir: str, table: str, cols: list[str]) -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=cols).to_pandas()


def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-style pricing summary.

    Output: (l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, sum_charge, avg_qty, avg_price, avg_disc, count_order)
    — sums rounded to 2 dp, avgs to 4 dp, all derived from exact partial
    sums (two-phase aggregation; division + rounding only at the end)."""
    ds = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch["l_shipdate"], pa.scalar(np.datetime64(Q1_CUTOFF, "us")))
        )
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), batch["l_tax"]))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": batch["l_quantity"],
                "price": batch["l_extendedprice"],
                "disc_price": disc_price,
                "charge": charge,
                "disc": batch["l_discount"],
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [
                    ("qty", "sum"),
                    ("price", "sum"),
                    ("disc_price", "sum"),
                    ("charge", "sum"),
                    ("disc", "sum"),
                    ("n", "sum"),
                ]
            )
            .rename_columns(
                [
                    "l_returnflag",
                    "l_linestatus",
                    "qty",
                    "price",
                    "disc_price",
                    "charge",
                    "disc",
                    "n",
                ]
            )
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum(on="qty", alias_name="s_qty"),
            Sum(on="price", alias_name="s_price"),
            Sum(on="disc_price", alias_name="s_disc_price"),
            Sum(on="charge", alias_name="s_charge"),
            Sum(on="disc", alias_name="s_disc"),
            Sum(on="n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pa.array(round_half_away(t["s_qty"].to_numpy(zero_copy_only=False), 2)),
                "sum_base_price": pa.array(round_half_away(t["s_price"].to_numpy(zero_copy_only=False), 2)),
                "sum_disc_price": pa.array(round_half_away(t["s_disc_price"].to_numpy(zero_copy_only=False), 2)),
                "sum_charge": pa.array(round_half_away(t["s_charge"].to_numpy(zero_copy_only=False), 2)),
                "avg_qty": pa.array(
                    round_half_away(t["s_qty"].to_numpy(zero_copy_only=False) / n, 4)
                ),
                "avg_price": pa.array(
                    round_half_away(t["s_price"].to_numpy(zero_copy_only=False) / n, 4)
                ),
                "avg_disc": pa.array(
                    round_half_away(t["s_disc"].to_numpy(zero_copy_only=False) / n, 4)
                ),
                "count_order": t["n"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q3_top_orders(sf_dir: str) -> ray.data.Dataset:
    """Q3-style: top-10 BUILDING-segment orders by discounted revenue.

    Output: (o_orderkey, revenue, o_orderdate_us) — revenue rounded 2 dp,
    deterministic order (revenue desc, o_orderkey asc), limit 10.
    Fully distributed plan (no driver-side dimension materialization,
    VERDICT r1 #2): per-order revenue = per-batch partial + one bucketed
    sum over the whole fact; qualifying (segment + date) orders via
    bucketed semi-join on customers; dates attach in the same bucketed
    inner join — the driver only ever sees the final 10 rows."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], Q3_SEGMENT)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.less(t["o_orderdate"], pa.scalar(np.datetime64(Q3_DATE, "us")))
        ),
        batch_format="pyarrow",
    )
    # planner choice (r3): the filtered-segment customer keys broadcast as
    # an is_in set while the customer table's size hint is under the
    # broadcast limit, dropping one sequential exchange; past the limit
    # the same call degrades to the bucketed semi-join
    from .joins import auto_semi_join

    orders_f = auto_semi_join(
        orders, cust, "o_custkey", "c_custkey", how="semi"
    ).select_columns(["o_orderkey", "o_orderdate"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partials(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table({"o_orderkey": batch["l_orderkey"], "rev": rev})
        return (
            t.group_by("o_orderkey").aggregate([("rev", "sum")]).rename_columns(
                ["o_orderkey", "rev"]
            )
        )

    import polars as pl

    # the per-order revenue combine fuses into the join's bucket exchange
    # (both key on o_orderkey): one all-to-all instead of two
    joined = bucketed_join(
        li.map_batches(partials, batch_format="pyarrow"),
        orders_f,
        on="o_orderkey",
        how="inner",
        left_combine=lambda df: df.group_by("o_orderkey").agg(
            pl.col("rev").sum()
        ),
    )
    top = (
        joined.map_batches(lambda t: round_col(t, "rev", 2), batch_format="pyarrow")
        .sort(["rev", "o_orderkey"], descending=[True, False])
        .limit(TOP_PARTS_K)
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "revenue": t["rev"],
                "o_orderdate_us": t["o_orderdate"].cast(pa.int64()),
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


def top_parts_by_revenue(sf_dir: str) -> pd.DataFrame:
    """Top-10 parts by lineitem revenue, with part attributes.

    Output: (p_partkey, p_name, p_brand, revenue) — broadcast-join the part
    dimension onto the aggregated fact stream."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def partials(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table({"p_partkey": batch["l_partkey"], "rev": rev})
        return (
            t.group_by("p_partkey").aggregate([("rev", "sum")]).rename_columns(
                ["p_partkey", "rev"]
            )
        )

    top = (
        grouped_sum(
            li.map_batches(partials, batch_format="pyarrow"),
            ["p_partkey"],
            {"rev": "rev"},
        )
        .map_batches(lambda t: round_col(t, "rev", 2), batch_format="pyarrow")
        .sort(["rev", "p_partkey"], descending=[True, False])
        .limit(TOP_PARTS_K)
        .to_pandas()  # K rows — the one legitimate driver materialization
    )
    # attach attributes for just the K winners: distributed is_in filter of
    # the part dimension (never a full-dimension driver read), then a K-row
    # pandas merge on the driver
    keys = top["p_partkey"].tolist()
    attrs = (
        broadcast_semi_join(
            _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand"]),
            "p_partkey",
            keys,
        )
        .to_pandas()
    )
    out = top.merge(attrs, on="p_partkey").rename(columns={"rev": "revenue"})
    return out[["p_partkey", "p_name", "p_brand", "revenue"]]


def customers_without_orders(sf_dir: str) -> ray.data.Dataset:
    """Anti-join coverage: per segment, how many customers placed no orders.

    Output: (c_mktsegment, n_customers, n_without_orders) — one row per
    segment (schema-stable even when no customer lacks orders).  Fully
    distributed (VERDICT r1 #3): bucketed distinct of the fact key column
    (per-batch pre-dedup, then one low-cardinality exchange), then a
    bucketed LEFT join with a match marker — no fact column ever lands on
    the driver (A8 orphan-cleanup semantics, ``neo4j_manager.py:124-128``)."""
    import polars as pl

    from .shuffle import grouped_agg

    # per-batch pre-dedup shrinks the exchange; the final distinct fuses
    # into the join bucket (right_combine) — one all-to-all total
    okey_partials = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda t: pa.table(
            {"o_custkey": pc.unique(t["o_custkey"].combine_chunks())}
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    # planner choice (r3): membership marker broadcasts the (pre-deduped)
    # fact keys while the orders size hint is under the broadcast limit;
    # past it, the same call runs the bucketed LEFT join with the marker
    # combine — no fact column ever lands on the driver either way
    from .joins import auto_membership_marker

    marked = auto_membership_marker(
        cust, okey_partials, "c_custkey", "o_custkey"
    ).map_batches(
        lambda t: t.append_column(
            "w", pc.cast(pc.invert(t["in_right"]), pa.int64())
        ),
        batch_format="pyarrow",
    )
    return grouped_agg(
        marked,
        ["c_mktsegment"],
        {
            "n_customers": ("c_custkey", "size"),
            "n_without_orders": ("w", "sum"),
        },
    )


def nation_order_stats(sf_dir: str) -> ray.data.Dataset:
    """Orders per customer nation.

    Output: (n_name, n_orders, sum_totalprice).  Plan (VERDICT r1 #10): the
    fact side pre-aggregates to one row per customer, the customer
    dimension joins via the distributed bucketed hash join (it is NOT a
    broadcastable side at 100 TB), and only the 25-row nation lookup is
    broadcast."""
    from .shuffle import grouped_agg

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "v": batch["o_totalprice"],
            }
        )
        return (
            t.group_by("o_custkey")
            .aggregate([("n", "sum"), ("v", "sum")])
            .rename_columns(["o_custkey", "n", "v"])
        )

    import polars as pl

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    from .joins import broadcast_bytes_limit
    from .shuffle import dataset_size_hint

    hint = dataset_size_hint(cust)
    if hint is not None and hint <= broadcast_bytes_limit():
        # planner choice (r3): while the customer map fits the broadcast
        # budget, attach c_nationkey per batch and re-partial by nation —
        # the whole query collapses to ONE 25-key exchange.  Past the
        # budget the bucketed join below is the unbounded-size plan.
        import ray as _ray

        # ship the custkey->nationkey map as TWO sorted Arrow arrays, not a
        # Python dict: pa.Array refs are plasma zero-copy, so workers map
        # them once instead of re-unpickling millions of dict entries per
        # batch, and the lookup is a vectorized searchsorted instead of a
        # per-row .get loop (ADVICE r3)
        cdf = cust.to_pandas()
        order = np.argsort(cdf["c_custkey"].to_numpy(), kind="stable")
        keys_ref = _ray.put(
            pa.array(cdf["c_custkey"].to_numpy()[order], type=pa.int64())
        )
        vals_ref = _ray.put(
            pa.array(cdf["c_nationkey"].to_numpy()[order], type=pa.int64())
        )

        def attach(batch: pa.Table) -> pa.Table:
            keys = _ray.get(keys_ref).to_numpy()
            vals = _ray.get(vals_ref).to_numpy()
            k = batch["o_custkey"].to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                found = np.zeros(len(k), dtype=bool)
                nk = np.empty(0, dtype=np.int64)
            else:
                idx = np.minimum(np.searchsorted(keys, k), len(keys) - 1)
                # misses DROP: inner-join semantics, exactly like the
                # bucketed path (code-review r3)
                found = keys[idx] == k
                nk = vals[idx][found]
            t = pa.table(
                {
                    "c_nationkey": pa.array(nk, type=pa.int64()),
                    "n": pa.array(
                        batch["n"].to_numpy(zero_copy_only=False)[found]
                    ),
                    "v": pa.array(
                        batch["v"].to_numpy(zero_copy_only=False)[found]
                    ),
                }
            )
            return (
                t.group_by("c_nationkey")
                .aggregate([("n", "sum"), ("v", "sum")])
                .rename_columns(["c_nationkey", "n", "v"])
            )

        joined = orders.map_batches(
            partials, batch_format="pyarrow"
        ).map_batches(attach, batch_format="pyarrow")
    else:
        # per-customer combine fuses into the join exchange (same key)
        joined = bucketed_join(
            orders.map_batches(partials, batch_format="pyarrow"),
            cust,
            on="o_custkey",
            right_on="c_custkey",
            how="inner",
            left_combine=lambda df: df.group_by("o_custkey").agg(
                pl.col("n").sum(), pl.col("v").sum()
            ),
        )
    per_nation = grouped_agg(
        joined,
        ["c_nationkey"],
        {"n_orders": ("n", "sum"), "v": ("v", "sum")},
    )

    nation = _small_df(sf_dir, "nation", ["n_nationkey", "n_name"])
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def finish(t: pa.Table) -> pa.Table:
        keys = t["c_nationkey"].to_pylist()
        return pa.table(
            {
                "n_name": pa.array([name_of[k] for k in keys], type=pa.string()),
                "n_orders": t["n_orders"],
                "sum_totalprice": pa.array(
                    round_half_away(t["v"].to_numpy(zero_copy_only=False), 2)
                ),
            }
        )

    return per_nation.map_batches(finish, batch_format="pyarrow")


def customer_order_totals(sf_dir: str) -> ray.data.Dataset:
    """Large-large hash-partitioned shuffle join (Ray ``Dataset.join``):
    per-customer order totals with customer attributes.

    Output: (c_custkey, c_name, n_orders, sum_totalprice) for customers with
    >= 1 order.  Plan: bucketed pre-aggregation of the fact side (orders ->
    one row per customer) THEN the shuffle join — join inputs are minimal,
    the standard aggregate-before-join pushdown."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
                "v": batch["o_totalprice"],
            }
        )
        return (
            t.group_by("o_custkey")
            .aggregate([("n", "sum"), ("v", "sum")])
            .rename_columns(["o_custkey", "n", "v"])
        )

    import polars as pl

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    # bucketed_join replaces Ray's JoinOperator here: the fixed-partition
    # hash-shuffle join was 4x slower than every sibling query at sf0.1
    # (VERDICT r1 #7); the per-customer combine fuses into the join's own
    # exchange, so the whole query is ONE all-to-all.
    joined = bucketed_join(
        orders.map_batches(partials, batch_format="pyarrow"),
        cust,
        on="o_custkey",
        right_on="c_custkey",
        how="inner",
        left_combine=lambda df: df.group_by("o_custkey").agg(
            pl.col("n").sum().alias("n_orders"), pl.col("v").sum()
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "c_name": t["c_name"],
                "n_orders": t["n_orders"],
                "sum_totalprice": pa.array(
                    round_half_away(t["v"].to_numpy(zero_copy_only=False), 2)
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def orders_rank_window(sf_dir: str) -> ray.data.Dataset:
    """Window-function analog: per-customer order sequence number.

    Output: (o_custkey, o_orderkey, rn) with rn = rank by
    (o_orderdate, o_orderkey) within customer — deterministic tie-break.
    O2-style within-group ordering via map_groups."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized rank within every customer in the bucket
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        rn = g.groupby("o_custkey").cumcount() + 1
        return pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].to_numpy(),
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "rn": rn.astype("int64").to_numpy(),
            }
        )

    return bucketed_group_agg(orders, ["o_custkey"], rank)


QUANTILE_PS = (0.5, 0.9, 0.99)


def lineitem_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact distributed order statistics (p50/p90/p99 of l_quantity per
    return flag) via two-phase value-count histograms — the aggregate class
    a plain sum/count reduce can't express.

    Scale pattern: l_quantity has bounded cardinality (~50 distinct), so
    per-batch (flag, value) counts + one tiny grouped sum replace any
    global sort; reducer state is O(distinct values), independent of row
    count.  The final interpolation (type-7 / ``quantile_cont`` semantics:
    h = p*(n-1), linear between ranks floor(h), ceil(h)) runs on the
    per-flag histogram — a few dozen rows.

    Output: (l_returnflag, p50, p90, p99) rounded to 2 dp."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "q": batch["l_quantity"],
                "n": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )
        return (
            t.group_by(["l_returnflag", "q"])
            .aggregate([("n", "sum")])
            .rename_columns(["l_returnflag", "q", "n"])
        )

    counts = grouped_sum(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["l_returnflag", "q"],
        {"n": "n"},
    )

    def quants(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("q")
        vals = g["q"].to_numpy(dtype=np.float64)
        cum = np.cumsum(g["n"].to_numpy(dtype=np.int64))
        n = int(cum[-1])

        def qc(p: float) -> float:
            h = p * (n - 1)
            lo, hi = int(np.floor(h)), int(np.ceil(h))
            # value at 0-indexed rank r = first histogram bin with cum > r
            xlo = vals[np.searchsorted(cum, lo + 1)]
            xhi = vals[np.searchsorted(cum, hi + 1)]
            # DuckDB round() is half AWAY FROM ZERO; builtin round() is
            # half-to-even and silently diverges on .xx5 boundaries
            # (ADVICE r2) — every oracle-matched rounding goes through
            # round_half_away (functions/numerics convention)
            from ..functions.numerics import round_half_away

            return round_half_away(xlo + (h - lo) * (xhi - xlo), 2)

        return pd.DataFrame(
            {
                "l_returnflag": [g["l_returnflag"].iloc[0]],
                "p50": [qc(QUANTILE_PS[0])],
                "p90": [qc(QUANTILE_PS[1])],
                "p99": [qc(QUANTILE_PS[2])],
            }
        )

    return counts.groupby("l_returnflag").map_groups(quants, batch_format="pandas")


ORACLE_SQL: dict[str, str] = {
    "lineitem_quantiles": """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 2) AS p50,
       round(quantile_cont(l_quantity, 0.9), 2) AS p90,
       round(quantile_cont(l_quantity, 0.99), 2) AS p99
FROM lineitem GROUP BY l_returnflag
""",
    "q1_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge,
       round(sum(l_quantity) / count(*), 4) AS avg_qty,
       round(sum(l_extendedprice) / count(*), 4) AS avg_price,
       round(sum(l_discount) / count(*), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "q3_top_orders": f"""
SELECT o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       epoch_us(o.o_orderdate) AS o_orderdate_us
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT {TOP_PARTS_K}
""",
    "top_parts_by_revenue": f"""
SELECT p.p_partkey, p.p_name, p.p_brand,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
GROUP BY p.p_partkey, p.p_name, p.p_brand
ORDER BY revenue DESC, p.p_partkey
LIMIT {TOP_PARTS_K}
""",
    "customers_without_orders": """
SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(*) FILTER (NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
         AS BIGINT) AS n_without_orders
FROM customer c
GROUP BY c.c_mktsegment
""",
    "nation_order_stats": """
SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS sum_totalprice
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
""",
    "customer_order_totals": """
SELECT c.c_custkey, c.c_name, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS sum_totalprice
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
    "orders_rank_window": """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS BIGINT)
         AS rn
FROM orders
""",
}
