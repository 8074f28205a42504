"""Hierarchy derivation: url -> PROJECT / DOMAIN / PAGE containment.

The analog of the reference's path-hierarchy passes (M7-M10, O1:
``clangd_symbol_nodes_builder.py:389-477``): each file path emits its
ancestor folders, distinct-ed, then folder/file records with parent links.
For web pages the hierarchy is PROJECT -> DOMAIN (url host) -> PAGE (url).
Unlike the reference we need no topological insert order (O1) — the Parquet
sink has no FK constraints, so parent rows are emitted independently.

``domain_dataset`` computes the distinct-domain table once (per-batch
partial distinct + bucketed distinct); callers materialize it and share it
between the node and edge builders.
"""

from __future__ import annotations

from urllib.parse import urlparse

import pyarrow as pa
import ray.data

from .shuffle import distinct

PROJECT_NODE_ID = "project:root"


def domain_of(url: str) -> str:
    return urlparse(url).netloc


def _with_domain(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    return pa.table(
        {
            "url": batch["url"],
            "domain": pa.array([domain_of(u) for u in urls], type=pa.string()),
        }
    )


def domain_dataset(pages: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct domains of the corpus (small; callers materialize)."""
    partials = pages.select_columns(["url"]).map_batches(
        lambda b: pa.table(
            {
                "domain": pa.compute.unique(
                    pa.array(
                        [domain_of(u) for u in b["url"].to_pylist()],
                        type=pa.string(),
                    )
                )
            }
        ),
        batch_format="pyarrow",
    )
    return distinct(partials, ["domain"])


def hierarchy_edges(
    pages: ray.data.Dataset, domains: ray.data.Dataset | None = None
) -> ray.data.Dataset:
    """(url) -> CONTAINS edges: project->domain (distinct) + domain->page."""
    if domains is None:
        domains = domain_dataset(pages)

    def page_edges(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        doms = [domain_of(u) for u in urls]
        return pa.table(
            {
                "src": pa.array([f"domain:{d}" for d in doms], type=pa.string()),
                "type": pa.array(["CONTAINS"] * len(urls), type=pa.string()),
                "dst": pa.array([f"page:{u}" for u in urls], type=pa.string()),
            }
        )

    domain_edges = domains.map_batches(
        lambda b: pa.table(
            {
                "src": pa.array([PROJECT_NODE_ID] * len(b), type=pa.string()),
                "type": pa.array(["CONTAINS"] * len(b), type=pa.string()),
                "dst": pa.array(
                    [f"domain:{d}" for d in b["domain"].to_pylist()],
                    type=pa.string(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return pages.select_columns(["url"]).map_batches(
        page_edges, batch_format="pyarrow"
    ).union(domain_edges)


def hierarchy_nodes(
    pages: ray.data.Dataset, domains: ray.data.Dataset | None = None
) -> ray.data.Dataset:
    """PROJECT + DOMAIN + PAGE node rows (unique on node_id)."""
    if domains is None:
        domains = domain_dataset(pages)

    page_nodes = pages.select_columns(["url"]).map_batches(
        lambda b: pa.table(
            {
                "node_id": pa.array(
                    [f"page:{u}" for u in b["url"].to_pylist()], type=pa.string()
                ),
                "label": pa.array(["PAGE"] * len(b), type=pa.string()),
                "name": b["url"],
            }
        ),
        batch_format="pyarrow",
    )
    domain_nodes = domains.map_batches(
        lambda b: pa.table(
            {
                "node_id": pa.array(
                    [f"domain:{d}" for d in b["domain"].to_pylist()],
                    type=pa.string(),
                ),
                "label": pa.array(["DOMAIN"] * len(b), type=pa.string()),
                "name": b["domain"],
            }
        ),
        batch_format="pyarrow",
    )
    project_node = ray.data.from_arrow(
        pa.table(
            {
                "node_id": pa.array([PROJECT_NODE_ID], type=pa.string()),
                "label": pa.array(["PROJECT"], type=pa.string()),
                "name": pa.array(["root"], type=pa.string()),
            }
        )
    )
    return page_nodes.union(domain_nodes).union(project_node)
