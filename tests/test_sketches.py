"""HyperLogLog register sketch (stages/sketches.py).

The register STATE is oracle-exact (the construction SQL is shared
verbatim); the estimate quality and the merge (union) property — the two
things SQL can't discriminate — are pinned here.
"""

from __future__ import annotations

import pyarrow as pa

from clangd_to_neo4j_ray.stages import sketches as sk

from .util import assert_matches_oracle, duckdb_con, to_pandas

SF = "/root/testdata/sf0.001"


def test_hll_registers_match_oracle(ray_session):
    assert_matches_oracle(
        sk.hll_vocab_registers(SF), sk.ORACLE_SQL["hll_vocab_registers"], SF
    )


def test_hll_estimate_tracks_exact_distinct(ray_session):
    """Per-source estimates from the distributed registers land within 20%
    of the exact distinct token count (tiny-cardinality regime — the
    linear-counting correction path)."""
    regs = to_pandas(sk.hll_vocab_registers(SF))
    con = duckdb_con(SF)
    exact = dict(
        con.sql(
            "SELECT source, count(DISTINCT tok) FROM (SELECT source, "
            "unnest(string_split(text, ' ')) AS tok FROM documents) "
            "GROUP BY source"
        ).fetchall()
    )
    con.close()
    assert set(regs["source"]) == set(exact)
    for source, grp in regs.groupby("source"):
        est = sk.hll_estimate(dict(zip(grp["bucket"], grp["rho_max"])))
        n = exact[source]
        assert abs(est - n) / n < 0.20, (source, est, n)


def test_hll_merge_is_elementwise_max():
    """Registers of a union equal the element-wise max of the parts —
    the property that makes per-batch partials + a max exchange exact."""
    a = pa.table({"source": ["s"] * 3, "tok": ["x", "y", "z"]})
    b = pa.table({"source": ["s"] * 3, "tok": ["y", "z", "w"]})
    both = pa.table(
        {"source": ["s"] * 6, "tok": ["x", "y", "z", "y", "z", "w"]}
    )
    merged = sk.merge_registers(
        sk.hll_partial_registers(a), sk.hll_partial_registers(b)
    )
    direct = sk.merge_registers(sk.hll_partial_registers(both))
    assert merged == direct


def test_hll_partial_is_bounded():
    """A partial register table never exceeds sources x m rows, whatever
    the batch size — the sublinear-state contract."""
    n = 5000
    toks = pa.table(
        {
            "source": ["s"] * n,
            "tok": [f"tok{i}" for i in range(n)],
        }
    )
    out = sk.hll_partial_registers(toks)
    assert len(out) <= sk.HLL_M


def test_cms_registers_match_oracle(ray_session):
    assert_matches_oracle(
        sk.cms_token_counts(SF), sk.ORACLE_SQL["cms_token_counts"], SF
    )


def test_cms_estimates_upper_bound_exact_counts(ray_session):
    """CMS point estimates are >= the true frequency for every token
    (one-sided error), and exact for the hottest tokens when collisions
    are unlikely to dominate."""
    regs = to_pandas(sk.cms_token_counts(SF))
    con = duckdb_con(SF)
    exact = con.sql(
        "SELECT source, tok, CAST(count(*) AS BIGINT) FROM (SELECT source, "
        "unnest(string_split(text, ' ')) AS tok FROM documents) "
        "GROUP BY source, tok"
    ).fetchall()
    con.close()
    by_source: dict = {}
    for _, r in regs.iterrows():
        by_source.setdefault(r["source"], {})[
            (r["row_id"], r["bucket"])
        ] = r["cnt"]
    over = 0
    for source, tok, n in exact:
        est = sk.cms_estimate(by_source[source], tok)
        assert est >= n, (source, tok, est, n)
        if est > n:
            over += 1
    assert over < len(exact)  # not everything collided


def test_cms_merge_is_sum():
    """Registers of a union equal the element-wise SUM of the parts —
    the property that makes per-batch partials + a sum exchange exact."""
    a = pa.table({"source": ["s"] * 3, "tok": ["x", "y", "x"]})
    b = pa.table({"source": ["s"] * 2, "tok": ["x", "z"]})
    both = pa.table({"source": ["s"] * 5, "tok": ["x", "y", "x", "x", "z"]})
    merged: dict = {}
    for t in (sk.cms_partial_registers(a), sk.cms_partial_registers(b)):
        for r in t.to_pylist():
            k = (r["source"], r["row_id"], r["bucket"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    direct = {
        (r["source"], r["row_id"], r["bucket"]): r["cnt"]
        for r in sk.cms_partial_registers(both).to_pylist()
    }
    assert merged == direct
