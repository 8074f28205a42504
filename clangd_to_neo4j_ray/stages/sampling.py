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


ORACLE_SQL: dict[str, str] = {
    "split_train_val": f"""
SELECT doc_id, source,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|{SPLIT_SEED}'), 1, 2)
                 < '{TRAIN_HEX_CUTOFF}'
            THEN 'train' ELSE 'val' END AS split
FROM documents
""",
}
