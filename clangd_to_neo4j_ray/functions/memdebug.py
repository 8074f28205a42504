"""Per-stage memory accounting — the ``memory_debugger.py:8-39`` analog.

The reference wraps each pass with an RSS probe (and deliberately frees the
in-memory index between passes, ``clangd_graph_rag_builder.py:66-70``).  In a
streaming Ray Data engine the equivalents are (a) the driver process RSS and
(b) the cluster object-store usage — the two places a leak or an accidental
materialization shows up.  ``snapshot()`` is recorded into every stage entry
of the run manifest (stages/materialize.py) so a regression is visible in
the same artifact the resume logic reads.
"""

from __future__ import annotations


def rss_mb() -> float:
    """Driver-process peak RSS in MiB (ru_maxrss is KiB on Linux)."""
    import resource

    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)


def object_store_mb() -> float | None:
    """Bytes currently pinned in the Ray object store (None outside Ray),
    from cluster resource accounting (total minus available)."""
    try:
        import ray

        if not ray.is_initialized():
            return None
        res = ray.available_resources()
        total = ray.cluster_resources()
        if "object_store_memory" in total:
            used_b = total["object_store_memory"] - res.get(
                "object_store_memory", 0.0
            )
            return round(used_b / (1024 * 1024), 1)
    except Exception:
        return None
    return None


def snapshot() -> dict:
    """One manifest-ready memory record."""
    return {"driver_peak_rss_mb": rss_mb(), "object_store_used_mb": object_store_mb()}
