"""JSONL source/sink: CC-NET-style newline-delimited text dumps.

The other format web-text corpora actually ship in (one JSON object per
line: url/text/lang/...), complementing the Parquet and WARC paths.
Reader: file-per-block parallelism (``read_binary_files``), per-file
parse through ``pyarrow.json`` with an EXPLICIT schema (no type
inference drift across blocks), gzip by magic bytes.  Writer: row-range
sharded ``.jsonl[.gz]`` files with sorted keys and no float formatting
ambiguity (documents carry only ints + strings), so the roundtrip is
byte-deterministic.

Reference analog: the S1/S2 reader family — same contract as
``sources.warc``, different wire format.
"""

from __future__ import annotations

import gzip
import io
import json

import pyarrow as pa
import pyarrow.json as pj
import ray.data

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def parse_jsonl_bytes(buf: bytes) -> pa.Table:
    """One JSONL file -> documents-schema Arrow table (gzip by magic)."""
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    return pj.read_json(
        io.BytesIO(buf),
        parse_options=pj.ParseOptions(
            explicit_schema=DOCS_SCHEMA,
            unexpected_field_behavior="ignore",
        ),
    )


def read_jsonl_documents(paths: str | list[str]) -> ray.data.Dataset:
    """JSONL file(s)/dir -> documents-schema Dataset."""
    files = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [parse_jsonl_bytes(b.as_py()) for b in batch["bytes"]]
        )

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def write_jsonl_files(
    docs: pa.Table, out_dir: str, *, num_files: int = 4, compress: bool = False
) -> list[str]:
    """documents-schema table -> sharded .jsonl[.gz] files."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = docs.select(DOCS_SCHEMA.names).to_pylist()
    n = len(rows)
    per = max(1, (n + num_files - 1) // num_files)
    out: list[str] = []
    for i in range(0, n, per):
        body = "".join(
            json.dumps(r, sort_keys=True, ensure_ascii=False) + "\n"
            for r in rows[i : i + per]
        ).encode("utf-8")
        suffix = ".jsonl.gz" if compress else ".jsonl"
        path = os.path.join(out_dir, f"part-{i // per:05d}{suffix}")
        with open(path, "wb") as f:
            f.write(gzip.compress(body, mtime=0) if compress else body)
        out.append(path)
    return out
