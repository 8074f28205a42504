"""Parity tests: documents-KG pipeline vs DuckDB oracle (driver-style check)."""

from __future__ import annotations

import pytest

from clangd_to_neo4j_ray.pipelines import docs_kg

from .util import assert_matches_oracle

QUERIES = [
    ("kg_mentions", docs_kg.kg_mentions),
    ("kg_entity_nodes", docs_kg.kg_entity_nodes),
    ("kg_triples", docs_kg.kg_triples),
    ("kg_nodes", docs_kg.kg_nodes),
    ("kg_edges", docs_kg.kg_edges),
    ("kg_sources", docs_kg.kg_sources),
    ("kg_mention_windows", docs_kg.kg_mention_windows),
    ("kg_stats", docs_kg.kg_stats),
]


@pytest.mark.parametrize("name,fn", QUERIES, ids=[q[0] for q in QUERIES])
def test_docs_kg_query_matches_oracle(name, fn, sf_dir):
    assert_matches_oracle(fn(sf_dir), docs_kg.ORACLE_SQL[name], sf_dir)
