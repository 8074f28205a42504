"""Deterministic dataset splitting (training-data prep).

Hash-based assignment: split membership is a pure function of the row key
(md5 of key + split seed), so it is stable across runs, machines, and
repartitioning — the property ``random_shuffle``-based splits lack — and
it never shuffles: each batch maps independently, the scale profile of a
pure projection.  The split decision compares a fixed-length md5 hex
prefix lexicographically (the repo's SQL-reproducible convention, like the
minhash slices in stages/dedup.py), so the DuckDB oracle is exact.

The reference has no sampling stage (it processes every TU); this is one
of the training-data extensions a 100-TB corpus pipeline needs (held-out
eval splits cut BEFORE dedup/filtering so leakage checks can join back).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data

SPLIT_SEED = "split0"
TRAIN_HEX_CUTOFF = "e6"  # md5-hex 2-char prefix < 'e6': 230/256 ~ 89.8% train


def split_train_val(sf_dir: str) -> ray.data.Dataset:
    """Assign every document to 'train' or 'val' deterministically.

    Output: (doc_id, source, split)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def assign(batch: pa.Table) -> pa.Table:
        pre = [
            hashlib.md5(f"{i}|{SPLIT_SEED}".encode()).hexdigest()[:2]
            for i in batch["doc_id"].to_pylist()
        ]
        split = ["train" if p < TRAIN_HEX_CUTOFF else "val" for p in pre]
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


SAMPLE_SEED = "sample0"
SAMPLE_PER_SOURCE = 10


def sample_stratified(
    sf_dir: str, *, n_per_source: int = SAMPLE_PER_SOURCE
) -> ray.data.Dataset:
    """Deterministic uniform sample of ``n_per_source`` docs per source.

    Rank docs within each source by (md5(doc_id||seed), doc_id) and keep
    the first n — a seeded uniform draw that is stable across runs and
    repartitioning (same md5-hex convention as ``split_train_val``, so the
    oracle's row_number() ordering matches exactly).  Output:
    (doc_id, source).

    Scale: the shared ``packing.grouped_head_n`` bounded-reducer plan
    (per-batch partial head-n, then head-n per group in one bucketed
    exchange)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return sample_stratified_ds(ds, n_per_source=n_per_source)


def sample_stratified_ds(
    ds: ray.data.Dataset, *, n_per_source: int = SAMPLE_PER_SOURCE
) -> ray.data.Dataset:
    """``sample_stratified`` over an existing (doc_id, source, ...) dataset
    (e.g. the checkpointed curation profile, pipelines/curate.py)."""
    from .packing import grouped_head_n

    def keyed(batch: pa.Table) -> pa.Table:
        rk = [
            hashlib.md5(f"{i}|{SAMPLE_SEED}".encode()).hexdigest()
            for i in batch["doc_id"].to_pylist()
        ]
        return batch.append_column("rk", pa.array(rk, type=pa.string()))

    sampled = grouped_head_n(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "source",
        ["source", "rk", "doc_id"],
        [True, True, True],
        n_per_source,
    )
    return sampled.map_batches(
        lambda t: t.select(["doc_id", "source"]), batch_format="pyarrow"
    )


ORACLE_SQL: dict[str, str] = {
    "sample_stratified": f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '|{SAMPLE_SEED}'), doc_id
         ) AS rn
  FROM documents
)
SELECT doc_id, source FROM r WHERE rn <= {SAMPLE_PER_SOURCE}
""",
    "split_train_val": f"""
SELECT doc_id, source,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|{SPLIT_SEED}'), 1, 2)
                 < '{TRAIN_HEX_CUTOFF}'
            THEN 'train' ELSE 'val' END AS split
FROM documents
""",
}
