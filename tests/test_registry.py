"""Registry consistency: every driver query/oracle pair is well-formed.

Cheap (no Ray execution): catches oracle-SQL syntax drift and
registration mistakes before the driver's correctness gate does."""

from __future__ import annotations

import duckdb

from clangd_to_neo4j_ray.queries import ORACLE, QUERIES

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def test_every_oracle_has_a_query():
    assert set(ORACLE) <= set(QUERIES)
    # the only rows-only entries are the documented non-SQL-shaped two
    assert set(QUERIES) - set(ORACLE) == {
        "pages_kg_flagship",
        "multimodal_features",
    }


def test_oracles_execute_against_real_views(sf_dir):
    """Each oracle must run end-to-end in DuckDB on the real test tables
    (syntax + column references + recursive CTEs)."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    for name, sql in ORACLE.items():
        df = con.sql(sql).df()
        assert len(df.columns) >= 1, name


def test_all_queries_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name
