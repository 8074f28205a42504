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
