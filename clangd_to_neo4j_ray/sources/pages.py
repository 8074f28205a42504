"""Pages-table source (S1/S2 analogs) + documents-table adapter.

The pages schema is the BASELINE.json input_hint contract::

    pages(url: string, warc_ts: timestamp[us, UTC], html: binary,
          text: string, lang: string)

``read_pages`` is a column-pruned block-parallel Parquet read (the engine
replaces the reference's manual doc-boundary chunking,
``clangd_index_yaml_parser.py:310-372``, with Parquet row-group blocks).

``documents_as_pages`` adapts the driver testdata ``documents`` table into
the pages schema (FIXTURES.md "thin adapter" note) for smoke runs: html is
absent (extract passes text through), warc_ts is synthesized
deterministically from doc_id.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
_EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z


def read_pages(
    path: str, *, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Column-pruned read of a pages Parquet directory/file."""
    return ray.data.read_parquet(path, columns=columns)


def documents_as_pages(sf_dir: str) -> ray.data.Dataset:
    """documents(doc_id, text, lang, source, ...) -> pages schema."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )

    def adapt(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        return pa.table(
            {
                "url": pa.array(
                    [f"https://{s}.example.com/doc/{i}" for s, i in zip(srcs, ids)],
                    type=pa.string(),
                ),
                "warc_ts": pa.array(
                    [_EPOCH_US + i * 1_000_000 for i in ids],
                    type=pa.timestamp("us", tz="UTC"),
                ),
                # html omitted (docstring contract): extract passes rows
                # without an html column straight through
                "text": batch["text"],
                "lang": batch["lang"],
            }
        )

    return docs.map_batches(adapt, batch_format="pyarrow")
