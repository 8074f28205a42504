"""Central query/oracle registry — the user-extension surface.

The analog of the reference's strategy registries and composable CLI arg
groups (``input_params.py:11-70``, SURVEY §2.9): every implemented
operator/pipeline registers a named callable (taking ``sf_dir``) and, when
SQL-expressible, a DuckDB oracle query with matching column names.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from .pipelines import docs_kg

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, fn: Callable[[str], Any], sql: str | None = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


# --- documents-KG pipeline (flagship; SURVEY §2.2/2.4/2.5/2.6) ---
for _name, _fn in [
    ("kg_mentions", docs_kg.kg_mentions),
    ("kg_entity_nodes", docs_kg.kg_entity_nodes),
    ("kg_triples", docs_kg.kg_triples),
    ("kg_nodes", docs_kg.kg_nodes),
    ("kg_edges", docs_kg.kg_edges),
    ("kg_sources", docs_kg.kg_sources),
    ("kg_stats", docs_kg.kg_stats),
]:
    register(_name, _fn, docs_kg.ORACLE_SQL[_name])
