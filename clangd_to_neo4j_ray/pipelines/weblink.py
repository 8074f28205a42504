"""Checkpointed host link-graph build over a partitioned pages corpus.

The web tier's resumability contract (BASELINE.json north_rule: "resumable
from checkpoint with per-partition lineage + metrics") applied to the
web-native family: link-extraction partials are computed ONCE per input
Parquet partition through ``StageCheckpoint`` (content-fingerprinted,
atomic tmp+rename, manifest with rows + wall seconds — the durable
generalization of the reference's parse caches,
``compilation_manager.py:27-94``), and the final edge aggregation is one
bucketed exchange over the persisted partials.

A restart skips finished partitions; touching one partition recomputes
exactly that partition's partials (the extraction — the expensive regex
scan over raw page bytes — is what checkpointing protects); removed
partitions purge their outputs.  The partials are ALREADY per-batch
aggregated (distinct host pairs per batch), so the checkpoint payload is
the compressed edge-contribution table, not raw links.
"""

from __future__ import annotations

import ray.data

from ..stages.linkgraph import doc_link_partials, sum_link_partials
from ..state.checkpoint import StageCheckpoint

PARTIALS_STAGE = "link_partials"


def _partials_stage(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(doc_link_partials, batch_format="pyarrow")


def link_graph_checkpointed(pages_dir: str, work_dir: str) -> dict:
    """Build the host link graph with per-partition checkpoints.

    Returns {"edges": Dataset(src_host, dst_host, n_links),
    "stats": {"computed": [...], "skipped": [...], "purged": [...]}}."""
    ckpt = StageCheckpoint(work_dir, PARTIALS_STAGE)
    stats = ckpt.run(pages_dir, _partials_stage)
    edges = sum_link_partials(ckpt.output_dataset())
    return {"edges": edges, "stats": stats}


def link_graph_direct(pages_dir: str) -> ray.data.Dataset:
    """Uncheckpointed reference plan over the same partitioned corpus
    (equality gate for the resume tests)."""
    return sum_link_partials(
        _partials_stage(ray.data.read_parquet(pages_dir))
    )
