"""Driver contract for the Ray-Data-native KG-construction engine.

The driver calls ``ray.init(...)`` itself before importing this module, so
nothing here (or in the library) calls ``ray.init``/``ray.shutdown``.

``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL for each
(column names match exactly).  Entries without SQL (stateful/model-driven
stages) get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from clangd_to_neo4j_ray.context import tune_data_context
from clangd_to_neo4j_ray.queries import ORACLE, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: documents-KG triples on sf0.001.

    The full extract -> mention -> link -> canonicalize flow, returning the
    deduped (subj, pred, obj) triple Dataset.
    """
    tune_data_context()
    from clangd_to_neo4j_ray.pipelines import docs_kg

    return docs_kg.kg_triples(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    tune_data_context()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
