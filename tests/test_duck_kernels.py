"""Parity of the embedded-DuckDB md5 kernels vs the scalar hashlib path.

VERDICT r4 #1 replaced the per-shingle/per-row hashlib Python loops with
per-batch DuckDB kernels (functions/duck.py); these tests pin the two
bit-identical, including the order-preservation assumption projections
rely on (single-threaded connection, preserve_insertion_order default).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from clangd_to_neo4j_ray.functions.duck import md5_hex_arrow, sql_over
from clangd_to_neo4j_ray.stages.dedup import (
    N_BANDS,
    _band_sigs,
    interleave_band_sigs,
    minhash_sig_cols,
)
from clangd_to_neo4j_ray.stages.sampling import (
    SPLIT_SEED,
    TRAIN_HEX_CUTOFF,
    _split_tags,
)
from clangd_to_neo4j_ray.stages.text import FINGERPRINT_K, shingle_rows

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a b c",
    "x",
    "",
    "repeat repeat repeat repeat repeat repeat",
    "one two three four five six seven",
]


def test_md5_hex_arrow_matches_hashlib_in_order():
    vals = [f"v{i} {i % 7}" for i in range(5000)] + ["", "a", "unicode é ü"]
    got = md5_hex_arrow(pa.array(vals, type=pa.string())).to_pylist()
    want = [hashlib.md5(v.encode("utf-8")).hexdigest() for v in vals]
    assert got == want


def test_split_tags_match_hashlib():
    ids = list(range(2000))
    got = _split_tags(pa.array(ids, type=pa.int64())).to_pylist()
    want = [
        "train"
        if hashlib.md5(f"{i}|{SPLIT_SEED}".encode()).hexdigest()[:2]
        < TRAIN_HEX_CUTOFF
        else "val"
        for i in ids
    ]
    assert got == want
    assert len(set(got)) == 2  # both splits exercised


def test_shingle_rows_matches_scalar():
    batch = pa.table(
        {"doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
         "text": pa.array(TEXTS, type=pa.string())}
    )
    for k in (2, 3, FINGERPRINT_K):
        parents, sh = shingle_rows(batch, k)
        got = list(zip(parents.tolist(), sh.to_pylist()))
        want = []
        for row, text in enumerate(TEXTS):
            toks = text.split(" ")
            for i in range(len(toks) - k + 1):
                want.append((row, " ".join(toks[i : i + k])))
        assert got == want


def test_minhash_sig_cols_matches_band_sigs():
    batch = pa.table(
        {"doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
         "text": pa.array(TEXTS, type=pa.string())}
    )
    row_idx, band_sigs = minhash_sig_cols(batch)
    flat = interleave_band_sigs(band_sigs)
    got: dict[int, list[str]] = {
        int(r): list(flat[i * N_BANDS : (i + 1) * N_BANDS])
        for i, r in enumerate(row_idx)
    }
    want = {
        row: _band_sigs(text) for row, text in enumerate(TEXTS) if _band_sigs(text)
    }
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=8
    )
)
def test_minhash_sig_cols_property(texts):
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    row_idx, band_sigs = minhash_sig_cols(batch)
    flat = interleave_band_sigs(band_sigs)
    got = {
        int(r): list(flat[i * N_BANDS : (i + 1) * N_BANDS])
        for i, r in enumerate(row_idx)
    }
    want = {
        row: _band_sigs(t) for row, t in enumerate(texts) if _band_sigs(t)
    }
    assert got == want


def test_grouped_kernel_min_md5():
    t = pa.table(
        {"p": pa.array([0, 0, 1, 2, 2, 2], type=pa.int64()),
         "s": pa.array(["b", "a", "z", "m", "q", "c"], type=pa.string())}
    )
    out = sql_over("SELECT p, min(md5(s)) AS fp FROM t GROUP BY p ORDER BY p", t=t)
    want = [
        min(hashlib.md5(x.encode()).hexdigest() for x in grp)
        for grp in (["b", "a"], ["z"], ["m", "q", "c"])
    ]
    assert out["fp"].to_pylist() == want
    assert out["p"].to_pylist() == [0, 1, 2]


def test_entity_ids_arrow_parity():
    """Vectorized entity-id kernel is bit-identical to the scalar hashlib
    reference on unicode/empty/long inputs."""
    from clangd_to_neo4j_ray.functions.hashing import entity_ids, entity_ids_arrow

    vals = ["spark", "", "ünïcode ✓", "a" * 500, "the", "spark"]
    got = entity_ids_arrow(pa.array(vals, type=pa.string())).to_pylist()
    assert got == list(entity_ids(vals))
