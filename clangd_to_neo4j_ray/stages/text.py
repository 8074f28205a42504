"""Text-analysis operators over the ``documents`` table.

The training-data-pipeline extensions (language-ID heuristic, quality
scoring, token counting, document fingerprinting) expressed as vectorized
``map_batches`` stages with exact DuckDB oracles.  Quality metrics are
integer-valued to keep the oracle comparison rounding-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.textops import explode_tokens

STOPWORDS = ("the", "a")
FINGERPRINT_K = 5  # tokens per fingerprint shingle
LANGID_MIN_STOPWORDS = 2  # >=2 stopword tokens -> 'en'


def _read_docs(sf_dir: str, cols: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


def text_quality(sf_dir: str) -> ray.data.Dataset:
    """Per-document quality stats (integer-exact).

    Output: (doc_id, n_tokens, n_types, n_stopwords, max_token_len)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    stop_arr = pa.array(STOPWORDS, type=pa.string())

    def stats(batch: pa.Table) -> pa.Table:
        flat, _pos, parents = explode_tokens(batch)
        n_rows = len(batch)
        n_tokens = np.bincount(parents, minlength=n_rows)
        is_stop = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(parents[is_stop], minlength=n_rows)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        max_len = np.zeros(n_rows, dtype=np.int64)
        np.maximum.at(max_len, parents, lens)
        # distinct tokens per doc via arrow group_by on (parent, token)
        t = pa.table({"p": pa.array(parents), "tok": flat})
        per_tok = t.group_by(["p", "tok"]).aggregate([([], "count_all")])
        n_types = np.bincount(
            per_tok["p"].to_numpy(zero_copy_only=False), minlength=n_rows
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens.astype(np.int64)),
                "n_types": pa.array(n_types.astype(np.int64)),
                "n_stopwords": pa.array(n_stop.astype(np.int64)),
                "max_token_len": pa.array(max_len.astype(np.int64)),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def text_langid(sf_dir: str) -> ray.data.Dataset:
    """Deterministic language-ID heuristic: stopword-count rule.

    Output: (doc_id, lang, lang_guess) — ``lang`` is the table's label,
    ``lang_guess`` = 'en' if the doc has >= 2 stopword tokens else 'other'.
    (On real web text this would be an n-gram profile scorer in the same
    map_batches shape; the rule here is deliberately SQL-reproducible.)"""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    stop_arr = pa.array(STOPWORDS, type=pa.string())

    def guess(batch: pa.Table) -> pa.Table:
        flat, _pos, parents = explode_tokens(batch)
        is_stop = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(parents[is_stop], minlength=len(batch))
        lang_guess = np.where(n_stop >= LANGID_MIN_STOPWORDS, "en", "other")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "lang_guess": pa.array(lang_guess, type=pa.string()),
            }
        )

    return ds.map_batches(guess, batch_format="pyarrow")


def text_token_totals(sf_dir: str) -> ray.data.Dataset:
    """Corpus token accounting by (source, lang).

    Output: (source, lang, n_docs, n_tokens) — two-phase aggregation."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang", "source"])

    def partials(batch: pa.Table) -> pa.Table:
        _flat, _pos, parents = explode_tokens(batch)
        n_tokens = np.bincount(parents, minlength=len(batch)).astype(np.int64)
        t = pa.table(
            {
                "source": batch["source"],
                "lang": batch["lang"],
                "docs": pa.array(np.ones(len(batch), dtype=np.int64)),
                "toks": pa.array(n_tokens),
            }
        )
        return (
            t.group_by(["source", "lang"])
            .aggregate([("docs", "sum"), ("toks", "sum")])
            .rename_columns(["source", "lang", "docs", "toks"])
        )

    from .shuffle import grouped_agg

    return grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["source", "lang"],
        {"n_docs": ("docs", "sum"), "n_tokens": ("toks", "sum")},
    )


VOCAB_K = 50  # heavy-hitter cutoff for the per-source vocabulary


def vocab_top_tokens(sf_dir: str, *, k: int = VOCAB_K) -> ray.data.Dataset:
    """Per-source vocabulary heavy hitters — the tokenizer-training prep
    stage: the k most frequent tokens of every source, with exact counts.

    Output: (source, tok, n) — per source the k highest-count tokens,
    count ties broken by ascending token (a total order, so the oracle's
    row_number() ordering matches exactly).

    Plan (bounded at any corpus size): per-batch partial (source, tok)
    counts via one Arrow group_by — the exchange ships each block's
    DISTINCT vocabulary, not its token stream — then one bucketed
    exchange summing counts per (source, tok), then ``grouped_head_n``
    per-source top-k (its partial head-n bounds the final exchange to k
    rows per source per block)."""
    from .packing import grouped_head_n
    from .shuffle import grouped_agg

    ds = _read_docs(sf_dir, ["text", "source"])

    def partials(batch: pa.Table) -> pa.Table:
        flat, _pos, parents = explode_tokens(batch)
        t = pa.table(
            {
                "source": batch["source"].take(pa.array(parents)),
                "tok": flat,
            }
        )
        return (
            t.group_by(["source", "tok"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "tok", "n"])
        )

    counts = grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["source", "tok"],
        {"n": ("n", "sum")},
    )
    return grouped_head_n(
        counts, "source", ["source", "n", "tok"], [True, False, True], k
    )


def langid_confusion(sf_dir: str) -> ray.data.Dataset:
    """Label-vs-guess confusion matrix for the language-ID heuristic —
    the corpus-level accuracy readout a curation run gates on before
    trusting ``lang_guess`` as a filter (the per-doc rule is
    ``text_langid``'s; reference analog: the kind-histogram QA readout,
    ``clangd_symbol_nodes_builder.py`` kind counts).

    Output: (lang, lang_guess, n_docs).  Plan: the guess is computed
    batch-local exactly as ``text_langid`` does, then pre-aggregated to
    (lang, guess) partial counts inside the same ``map_batches`` — the
    exchange ships O(langs x 2) rows per block, never per-doc rows."""
    from .shuffle import grouped_agg

    ds = _read_docs(sf_dir, ["text", "lang"])
    stop_arr = pa.array(STOPWORDS, type=pa.string())

    def partials(batch: pa.Table) -> pa.Table:
        flat, _pos, parents = explode_tokens(batch)
        is_stop = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(parents[is_stop], minlength=len(batch))
        guess = np.where(n_stop >= LANGID_MIN_STOPWORDS, "en", "other")
        t = pa.table(
            {"lang": batch["lang"], "lang_guess": pa.array(guess, type=pa.string())}
        )
        return (
            t.group_by(["lang", "lang_guess"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "lang_guess", "n_docs"])
        )

    return grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["lang", "lang_guess"],
        {"n_docs": ("n_docs", "sum")},
    )


TREND_K = 5  # tokens reported per time bucket


def trending_tokens(sf_dir: str, *, k: int = TREND_K) -> ray.data.Dataset:
    """Per-minute trending tokens over the pages crawl timeline: the k
    most frequent tokens of every ``warc_ts`` minute bucket, each with its
    count in the PREVIOUS minute and the delta — the crawl-monitoring
    readout (which terms are surging right now) over the input_hint
    timestamp column.

    Output: (minute, tok, n, n_prev, delta) — ``minute`` is the epoch
    minute index of ``warc_ts``, top-k per minute by (n desc, tok asc).

    Plan (single-exchange lag, no self-join): each batch emits its
    partial (minute, tok) counts TWICE — once under the bucket's own key
    carrying ``n``, once under ``minute+1`` carrying ``n_prev`` — so one
    ``grouped_agg`` exchange sums both columns and the previous-minute
    lag falls out without a second pass over the counts (a self-join on
    ``minute-1`` would execute the upstream count plan twice and pay a
    second all-to-all).  Carrier-only rows (token absent from the current
    minute, n == 0) are dropped after the exchange; ``grouped_head_n``
    then bounds the final top-k exchange to k rows per minute per block."""
    from ..sources.pages import documents_as_pages
    from .packing import grouped_head_n
    from .shuffle import grouped_agg

    pages = documents_as_pages(sf_dir)

    def partials(batch: pa.Table) -> pa.Table:
        minute = pc.divide(
            pc.cast(batch["warc_ts"], pa.int64()), 60_000_000
        )  # us -> epoch minute
        flat, _pos, parents = explode_tokens(batch)
        t = pa.table({"minute": minute.take(pa.array(parents)), "tok": flat})
        cnt = (
            t.group_by(["minute", "tok"])
            .aggregate([([], "count_all")])
            .rename_columns(["minute", "tok", "n"])
        )
        zeros = pa.array(np.zeros(len(cnt), dtype=np.int64))
        cur = pa.table(
            {"minute": cnt["minute"], "tok": cnt["tok"], "n": cnt["n"], "n_prev": zeros}
        )
        prv = pa.table(
            {
                "minute": pc.add(cnt["minute"], 1),
                "tok": cnt["tok"],
                "n": zeros,
                "n_prev": cnt["n"],
            }
        )
        return pa.concat_tables([cur, prv])

    counts = grouped_agg(
        pages.map_batches(partials, batch_format="pyarrow"),
        ["minute", "tok"],
        {"n": ("n", "sum"), "n_prev": ("n_prev", "sum")},
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n"], 0))
        return t.append_column("delta", pc.subtract(t["n"], t["n_prev"]))

    ranked = counts.map_batches(finish, batch_format="pyarrow")
    return grouped_head_n(
        ranked,
        "minute",
        ["minute", "n", "tok"],
        [True, False, True],
        k,
        out_cols=["minute", "tok", "n", "n_prev", "delta"],
    )


_BPE_WORD = r"[a-z]+"
_BPE_NUM = r"[0-9]+"
_BPE_OTHER = r"[^a-z0-9 ]"


def text_token_bpeish(sf_dir: str) -> ray.data.Dataset:
    """Regex-class token counting (the BPE-ish tokenizer stand-in): counts
    of word runs, digit runs, and other non-space symbols per document.

    Output: (doc_id, n_words, n_nums, n_other).  Vectorized via Arrow's
    RE2 count kernel (r5; non-overlapping match counts — identical to the
    old per-doc ``findall`` loop, ~2x at sf0.1)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        cols = [
            pc.cast(
                pc.count_substring_regex(batch["text"], p), pa.int64()
            )
            for p in (_BPE_WORD, _BPE_NUM, _BPE_OTHER)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": cols[0],
                "n_nums": cols[1],
                "n_other": cols[2],
            }
        )

    return ds.map_batches(counts, batch_format="pyarrow")


def bpe_pair_counts(sf_dir: str) -> ray.data.Dataset:
    """Round-1 BPE merge statistics: corpus-wide counts of adjacent
    character pairs inside whitespace tokens — the aggregate a BPE
    tokenizer trainer computes before its first merge (Sennrich et al.
    2016).  Output: (pair, n_pairs).

    Plan: per-batch explode (token -> char bigrams, one embedded DuckDB
    kernel) with per-batch partial sums, then ONE bucketed exchange —
    the key space is bounded by alphabet^2, so the exchange is tiny no
    matter the corpus size (the same partial/combine shape as the A3
    counter accumulation)."""
    from ..functions.duck import sql_over
    from .shuffle import grouped_agg

    ds = _read_docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        return sql_over(
            """WITH tok AS (
              SELECT unnest(string_split(text, ' ')) AS tok FROM b),
            bi AS (
              SELECT substr(tok, i, 2) AS pair
              FROM (SELECT tok,
                      unnest(generate_series(1, length(tok) - 1)) AS i
                    FROM tok))
            SELECT pair, CAST(count(*) AS BIGINT) AS n_pairs
            FROM bi GROUP BY pair""",
            b=batch,
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["pair"],
        {"n_pairs": ("n_pairs", "sum")},
    )


POSTINGS_DF_CAP = 32  # tokens in more docs than this are dead-lettered


def _posting_groups(sf_dir: str) -> ray.data.Dataset:
    """Shared plan for the inverted index: per-batch distinct (tok,
    doc_id) pairs (docs never span batches, so per-batch distinct is
    globally distinct), ONE token-keyed exchange, per-bucket polars
    grouping into (tok, df, postings) — postings joined sorted doc_ids
    for tokens under the df cap, NULL above it."""
    import polars as pl

    from .shuffle import _bucketed_polars, auto_num_buckets

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        from ..functions.duck import sql_over

        return sql_over(
            """WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM b)
            SELECT DISTINCT a.doc_id, a.tok || ' ' || c.tok AS phrase
            FROM tok a JOIN tok c
              ON a.doc_id = c.doc_id AND c.i = a.i + 1""",
            b=batch,
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).drop("__bucket")
        out = (
            df.group_by("phrase")
            .agg(
                pl.col("doc_id").count().cast(pl.Int64).alias("df"),
                pl.col("doc_id").sort().cast(pl.Utf8).alias("_ids"),
            )
            .with_columns(
                pl.when(pl.col("df") <= POSTINGS_DF_CAP)
                .then(pl.col("_ids").list.join(","))
                .otherwise(None)
                .alias("postings")
            )
            .select(["phrase", "df", "postings"])
        )
        return out.to_arrow()

    raw = ds.map_batches(pairs, batch_format="pyarrow")
    return _bucketed_polars(
        raw, ["phrase"], per_bucket, auto_num_buckets(raw)
    )


def inverted_index(sf_dir: str) -> ray.data.Dataset:
    """Posting lists for rare-enough PHRASES (adjacent token 2-grams —
    the unigram vocabulary of the synthetic corpus is so small every
    token is corpus-frequent; bigrams carry a real df spread, and a
    phrase index is the retrieval structure anyway):
    (phrase, df, postings) with
    postings = comma-joined sorted doc_ids, restricted to tokens whose
    document frequency is <= POSTINGS_DF_CAP — the retrieval-side index a
    RAG pipeline materializes next to the KG, with the engine's
    established df-cap discipline (corpus-frequent terms carry no useful
    posting list and would make single rows unbounded; they are
    dead-lettered, see :func:`inverted_index_dead_letters`).

    Plan: per-batch distinct (tok, doc_id) pairs + ONE token-keyed
    exchange with a vectorized polars grouping per bucket."""
    import pyarrow.compute as _pc

    grouped = _posting_groups(sf_dir)
    return grouped.map_batches(
        lambda t: t.filter(_pc.is_valid(t["postings"])),
        batch_format="pyarrow",
    )


def inverted_index_dead_letters(sf_dir: str) -> ray.data.Dataset:
    """The capped side of :func:`inverted_index`: (tok, df) for tokens in
    more than POSTINGS_DF_CAP documents — explicit accounting instead of
    silent truncation."""
    import pyarrow.compute as _pc

    grouped = _posting_groups(sf_dir)
    return grouped.map_batches(
        lambda t: t.filter(_pc.is_null(t["postings"])).select(
            ["phrase", "df"]
        ),
        batch_format="pyarrow",
    )


COLLOC_MIN_COUNT = 5  # bigrams below this support are noise, dropped


def bigram_collocations(sf_dir: str) -> ray.data.Dataset:
    """Collocation mining: adjacent token pairs ranked by integer lift —
    ``lift_permille = (1000 * n_xy * N) // (n_x * n_y)`` (the
    pointwise-mutual-information family with the log dropped so the
    measure is integer-exact against the SQL oracle; the ORDERING over
    candidates is identical to PMI's).  Output: (w1, w2, n_xy,
    lift_permille) for pairs with support >= COLLOC_MIN_COUNT — the
    phrase-detection statistic a tokenizer/vocabulary pipeline computes
    (Mikolov et al. 2013 phrase scoring uses exactly this shape).

    Plan: ONE scan emits per-batch bigram partials; one bucketed exchange
    sums them.  Unigram totals are vocabulary-bounded, so they fold in a
    second tiny exchange and broadcast via ``ray.put`` into a vectorized
    per-batch lift kernel (the small-side lookup pattern).  int64
    headroom: 1000 * n_xy * N — rescale the permille factor down past
    ~1e12 total tokens (disclosed)."""
    import ray as _ray

    from ..functions.duck import sql_over
    from .shuffle import grouped_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def bigram_partials(batch: pa.Table) -> pa.Table:
        return sql_over(
            """WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM b),
            bg AS (
              SELECT a.tok AS w1, c.tok AS w2
              FROM tok a JOIN tok c
                ON a.doc_id = c.doc_id AND c.i = a.i + 1)
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy
            FROM bg GROUP BY w1, w2""",
            b=batch,
        )

    bigrams = grouped_agg(
        ds.map_batches(bigram_partials, batch_format="pyarrow"),
        ["w1", "w2"],
        {"n_xy": ("n_xy", "sum")},
    )

    def unigram_partials(batch: pa.Table) -> pa.Table:
        return sql_over(
            """SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
                 SELECT unnest(string_split(text, ' ')) AS tok FROM b)
               GROUP BY tok""",
            b=batch,
        )

    uni_table = pa.Table.from_pandas(
        grouped_agg(
            ds.map_batches(unigram_partials, batch_format="pyarrow"),
            ["tok"],
            {"n": ("n", "sum")},
        ).to_pandas()
    )
    total = int(pc.sum(uni_table["n"]).as_py())
    ref = _ray.put(uni_table)

    def lift(t: pa.Table) -> pa.Table:
        # vectorized per-batch hash join against the broadcast unigram
        # table — never a Python per-row dict lookup (the bigram exchange
        # output is vocab^2-bounded, i.e. large at corpus scale)
        uni = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        return sql_over(
            f"""SELECT b.w1, b.w2, b.n_xy,
                  CAST((1000 * b.n_xy * {total}) // (ux.n * uy.n) AS BIGINT)
                    AS lift_permille
                FROM b
                JOIN u ux ON ux.tok = b.w1
                JOIN u uy ON uy.tok = b.w2
                WHERE b.n_xy >= {COLLOC_MIN_COUNT}""",
            b=t,
            u=uni,
        )

    return bigrams.map_batches(lift, batch_format="pyarrow")


TFIDF_K = 5  # keywords kept per document


def tfidf_top_terms(sf_dir: str, *, k: int = TFIDF_K) -> ray.data.Dataset:
    """Keyword extraction: the k highest-tf-idf terms of every document.

    Score is the integer-exact tf-idf variant
    ``score_permille = (1000 * tf * n_docs) // df`` — the idf log is
    dropped so the measure reproduces bit-for-bit in the SQL oracle (same
    discipline as :func:`bigram_collocations`); within a document the
    candidate ordering is tf * (monotone idf transform), ties broken by
    ascending token for a total order.  Output: (doc_id, tok, tf,
    score_permille).

    Plan: two streaming scans beat one scan + two corpus-sized exchanges —
    scan 1 emits per-batch (tok, df) partials (exact: a doc is one row, so
    batch-local distinct-(doc,tok) counts never overlap across batches)
    folded in ONE vocabulary-bounded exchange and broadcast via
    ``ray.put``; scan 2 computes per-doc tf + score + top-k entirely
    batch-locally (per-doc rank needs no exchange for the same row-atomicity
    reason).  int64 headroom: 1000 * tf * n_docs — rescale past ~1e12
    docs*tf (disclosed)."""
    import ray as _ray

    from ..functions.duck import sql_over
    from .shuffle import grouped_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = _read_docs(sf_dir, ["doc_id"]).count()  # parquet metadata count

    def df_partials(batch: pa.Table) -> pa.Table:
        return sql_over(
            """SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
               FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                     FROM b) GROUP BY tok""",
            b=batch,
        )

    df_table = pa.Table.from_pandas(
        grouped_agg(
            ds.map_batches(df_partials, batch_format="pyarrow"),
            ["tok"],
            {"df": ("df", "sum")},
        ).to_pandas()
    )
    ref = _ray.put(df_table)

    def score(batch: pa.Table) -> pa.Table:
        dft = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        return sql_over(
            f"""WITH tf AS (
              SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM b) GROUP BY doc_id, tok),
            s AS (
              SELECT tf.doc_id, tf.tok, tf.tf,
                     CAST((1000 * tf.tf * {n_docs}) // d.df AS BIGINT)
                       AS score_permille,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY (1000 * tf.tf * {n_docs}) // d.df DESC,
                                tf.tok) AS rk
              FROM tf JOIN d ON d.tok = tf.tok)
            SELECT doc_id, tok, tf, score_permille FROM s WHERE rk <= {k}""",
            b=batch,
            d=dft,
        )

    return ds.map_batches(score, batch_format="pyarrow")


def text_repetition(sf_dir: str) -> ray.data.Dataset:
    """Repetition-based quality stats (the Gopher/C4 duplicate-n-gram rule
    family): per-document 2-gram duplication, integer-exact.

    Output: (doc_id, n_bigrams, max_bigram_count, n_dup_bigrams) for
    documents with >= 2 tokens; ``n_dup_bigrams`` counts occurrences
    belonging to a bigram that appears more than once in the document —
    the numerator of the "fraction of text inside duplicated 2-grams"
    filter a pretraining pipeline gates on.  One vectorized pass: explode,
    adjacent-pair join inside the batch, arrow group_by per (doc, bigram),
    bincount rollup — no exchange (per-doc stats are batch-local)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        flat, _pos, parents = explode_tokens(batch)
        n_rows = len(batch)
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_bigrams": pa.array([], type=pa.int64()),
                "max_bigram_count": pa.array([], type=pa.int64()),
                "n_dup_bigrams": pa.array([], type=pa.int64()),
            }
        )
        if len(flat) < 2:
            return empty
        same = parents[1:] == parents[:-1]
        if not same.any():
            return empty
        big = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " "
        )
        mask = pa.array(same)
        t = pa.table(
            {"p": pa.array(parents[:-1][same]), "bg": big.filter(mask)}
        )
        per_bg = t.group_by(["p", "bg"]).aggregate([([], "count_all")])
        pi = per_bg["p"].to_numpy(zero_copy_only=False)
        c = per_bg["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = np.bincount(pi, weights=c, minlength=n_rows).astype(np.int64)
        mx = np.zeros(n_rows, dtype=np.int64)
        np.maximum.at(mx, pi, c)
        dupm = c > 1
        dup = np.bincount(
            pi[dupm], weights=c[dupm], minlength=n_rows
        ).astype(np.int64)
        keep = pa.array(nb > 0)
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(keep),
                "n_bigrams": pa.array(nb).filter(keep),
                "max_bigram_count": pa.array(mx).filter(keep),
                "n_dup_bigrams": pa.array(dup).filter(keep),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def source_mix_weights(sf_dir: str) -> pa.Table:
    """Domain-mixing weights: per-source token share vs a uniform target.

    Output: (source, n_tokens, share_permille, weight_permille) —
    ``weight_permille`` is the integer-floored resampling factor that would
    equalize token share across sources (1000 = keep as is; the mixture
    reweighting step of a pretraining data recipe).  Plan: the per-source
    token totals go through one combined exchange; the weight arithmetic
    runs on the O(|sources|)-row result (bounded by the family's
    blocking-key assumption)."""
    from .shuffle import grouped_agg

    ds = _read_docs(sf_dir, ["doc_id", "text", "source"])

    def partials(batch: pa.Table) -> pa.Table:
        _flat, _pos, parents = explode_tokens(batch)
        n_tokens = np.bincount(parents, minlength=len(batch)).astype(np.int64)
        t = pa.table(
            {"source": batch["source"], "toks": pa.array(n_tokens)}
        )
        return (
            t.group_by("source")
            .aggregate([("toks", "sum")])
            .rename_columns(["source", "toks"])
        )

    per_src = grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["source"],
        {"n_tokens": ("toks", "sum")},
    ).take_all()  # bounded by source cardinality
    total = sum(r["n_tokens"] for r in per_src)
    n_src = len(per_src)
    per_src.sort(key=lambda r: r["source"])
    return pa.table(
        {
            "source": pa.array([r["source"] for r in per_src], type=pa.string()),
            "n_tokens": pa.array(
                [r["n_tokens"] for r in per_src], type=pa.int64()
            ),
            "share_permille": pa.array(
                [r["n_tokens"] * 1000 // total for r in per_src],
                type=pa.int64(),
            ),
            "weight_permille": pa.array(
                [total * 1000 // (n_src * r["n_tokens"]) for r in per_src],
                type=pa.int64(),
            ),
        }
    )


def shingle_rows(
    batch: pa.Table, k: int, *, text_col: str = "text"
) -> tuple[np.ndarray, pa.Array]:
    """All k-token shingles of a batch, fully vectorized.

    Returns ``(parents, shingles)``: row index into ``batch`` and the
    joined k-token shingle string, one row per shingle occurrence (not
    deduplicated).  Shingles never cross documents (k shifted token slices
    joined element-wise, masked to runs whose endpoints share a parent —
    parents are non-decreasing, so endpoint equality implies the whole run
    is one document)."""
    flat, _pos, parents = explode_tokens(batch, text_col=text_col)
    n = len(flat)
    if n < k:
        return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())
    parts = [flat.slice(j, n - k + 1) for j in range(k)]
    sh = pc.binary_join_element_wise(*parts, " ")
    mask = parents[k - 1 :] == parents[: n - k + 1]
    if not mask.all():
        sh = sh.filter(pa.array(mask))
    return parents[: n - k + 1][mask], sh


def source_lang_mix(sf_dir: str) -> ray.data.Dataset:
    """Per-source language composition: doc counts and the integer
    permille share of each language within its source — the blend
    designer's language-balance readout.

    Output: (source, lang, n_docs, share_permille).

    Plan: zero joins — per-batch (source, lang) partial counts, ONE
    exchange, then the per-source total rides a second pass over the
    O(sources x langs) folded rows (bounded, so the window-style share
    is computed in one bucketed group per source)."""
    from .shuffle import bucketed_group_agg, grouped_agg

    ds = _read_docs(sf_dir, ["source", "lang"])

    def partials(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by(["source", "lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "lang", "n_docs"])
        )

    counts = grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["source", "lang"],
        {"n_docs": ("n_docs", "sum")},
    )

    def share(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for source, g in df.groupby("source", sort=False):
            total = int(g["n_docs"].sum())
            g = g.copy()
            g["share_permille"] = (g["n_docs"] * 1000) // total
            out.append(g)
        return pd.concat(out, ignore_index=True)[
            ["source", "lang", "n_docs", "share_permille"]
        ]

    return bucketed_group_agg(counts, ["source"], share)


def doc_length_hist(sf_dir: str) -> ray.data.Dataset:
    """Per-source document-length profile on a log2 scale — the corpus
    shape readout a curation run eyeballs before setting length filters.

    Output: (source, len_bucket, n_docs) with ``len_bucket`` =
    floor(log2(n_chars + 1)) — integer-exact on both sides (numpy frexp
    exponent field vs the oracle's printf('%b') digit count, the
    ``events_interarrival`` discipline).

    Plan: zero joins — per-batch partial (source, bucket) counts via one
    Arrow group_by, one exchange of O(sources x 64) rows per block."""
    from .shuffle import grouped_agg

    ds = _read_docs(sf_dir, ["source", "n_chars"])

    def partials(batch: pa.Table) -> pa.Table:
        n1 = batch["n_chars"].to_numpy(zero_copy_only=False) + 1
        bucket = np.frexp(n1.astype(np.float64))[1] - 1
        t = pa.table(
            {
                "source": batch["source"],
                "len_bucket": pa.array(bucket.astype(np.int64)),
            }
        )
        return (
            t.group_by(["source", "len_bucket"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "len_bucket", "n_docs"])
        )

    return grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["source", "len_bucket"],
        {"n_docs": ("n_docs", "sum")},
    )


def source_length_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Per-source exact length quantiles (p10 / median / p90 of n_chars)
    — the grouped version of the exact-quantile plan
    (``relational.lineitem_quantiles``): quantiles over a 100-TB corpus
    without sorting it, per group.

    Output: (source, p10_chars, median_chars, p90_chars), each the value
    at rank ceil(q*n) (1-based), so the result is integer-exact and
    deterministic under duplicate lengths.

    Plan: per-batch partial (source, n_chars) value counts — the exchange
    ships each block's distinct lengths per source, not rows — one
    bucketed exchange keyed on source, then a vectorized per-source
    cumsum pick inside the bucket."""
    from .shuffle import bucketed_group_agg, grouped_agg

    ds = _read_docs(sf_dir, ["source", "n_chars"])

    def partials(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by(["source", "n_chars"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "n_chars", "n"])
        )

    counts = grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["source", "n_chars"],
        {"n": ("n", "sum")},
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for source, g in df.groupby("source", sort=False):
            g = g.sort_values("n_chars")
            vals = g["n_chars"].to_numpy()
            cum = g["n"].to_numpy().cumsum()
            n = int(cum[-1])
            row = [source]
            for num, den in ((1, 10), (1, 2), (9, 10)):
                rank = (num * n + den - 1) // den  # ceil(q * n), >= 1
                row.append(int(vals[np.searchsorted(cum, rank)]))
            out.append(row)
        return pd.DataFrame(
            out, columns=["source", "p10_chars", "median_chars", "p90_chars"]
        )

    return bucketed_group_agg(counts, ["source"], pick)


def source_overlap(sf_dir: str, *, k: int = FINGERPRINT_K) -> ray.data.Dataset:
    """Cross-source contamination matrix: for every source pair, the
    number of DISTINCT k-token shingles that occur in both — the corpus
    overlap audit run before mixing sources into a training blend (the
    between-source analog of the within-split ``split_contamination``
    check; RefinedWeb/Dolma-style overlap analysis).

    Output: (source_a, source_b, n_shared), source_a < source_b.

    Plan: per-batch DISTINCT (shingle, source) pairs (one Arrow group_by —
    the exchange ships each block's shingle VOCABULARY per source, not the
    occurrence stream), one bucketed exchange keyed on the shingle, then a
    per-bucket vectorized self-merge expands each shingle's source set
    into ordered pairs and pre-counts them; a final O(sources^2)-row
    ``grouped_agg`` sums the partials.  Per-shingle pair fan-out is
    bounded by #sources^2 regardless of how many documents share the
    shingle (sets are deduplicated before pairing), so there is no hot-key
    blowup and no df cap is needed — unlike the doc-level inverted index."""
    from .shuffle import bucketed_group_agg, grouped_agg

    ds = _read_docs(sf_dir, ["text", "source"])

    def partials(batch: pa.Table) -> pa.Table:
        parents, sh = shingle_rows(batch, k)
        t = pa.table(
            {"s": sh, "source": batch["source"].take(pa.array(parents))}
        )
        return t.group_by(["s", "source"]).aggregate([])

    distinct_pairs = ds.map_batches(partials, batch_format="pyarrow")

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["s", "source"])
        m = df.merge(df, on="s")
        m = m[m["source_x"] < m["source_y"]]
        out = (
            m.groupby(["source_x", "source_y"], sort=False)
            .size()
            .reset_index(name="n_shared")
        )
        return out.rename(
            columns={"source_x": "source_a", "source_y": "source_b"}
        )

    partial_counts = bucketed_group_agg(distinct_pairs, ["s"], pair_counts)
    return grouped_agg(
        partial_counts,
        ["source_a", "source_b"],
        {"n_shared": ("n_shared", "sum")},
    )


def text_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Winnowing-style document fingerprint: min md5 over 5-token shingles.

    Output: (doc_id, fp) for documents with >= 5 tokens.  The rolling-hash
    fingerprint analog with md5 for SQL parity.  The shingle explode is
    Arrow-vectorized and the md5+min-per-doc kernel runs as ONE embedded
    DuckDB query per batch (VERDICT r4 #1: the per-shingle hashlib Python
    loop was the engine's dominant CPU sink at corpus scale)."""
    from ..functions.duck import sql_over

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        parents, sh = shingle_rows(batch, FINGERPRINT_K)
        t = pa.table({"p": pa.array(parents), "s": sh})
        out = sql_over("SELECT p, min(md5(s)) AS fp FROM t GROUP BY p ORDER BY p", t=t)
        pidx = out["p"].combine_chunks()
        return pa.table(
            {
                "doc_id": pc.take(batch["doc_id"].combine_chunks(), pidx),
                "fp": out["fp"].combine_chunks(),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


# PII scrub patterns — RE2 syntax only (no lookaround), evaluated by BOTH
# pyarrow.compute (RE2) and DuckDB regexp_* (RE2), so the oracle reproduces
# the scrub byte-for-byte.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+1-555-[0-9]{4}"
PII_IP_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """PII redaction: emails / phone numbers / IPv4 hosts -> typed
    placeholders, with per-document match accounting.

    The training-data curation analog of the reference's tab sanitizer
    (``clangd_index_yaml_parser.py`` sanitize pass, SURVEY M2): a
    per-record text rewrite that must be deterministic and lossless in
    count.  The synthetic corpus carries no PII, so the query first
    injects deterministic doc_id-derived markers (email / phone / IP by
    ``doc_id % 3``) — the oracle performs the identical injection, which
    makes the scrub check non-vacuous: every count and the full cleaned
    text (via md5) are value-compared.

    Everything is vectorized: the injection is numpy string kernels, the
    scrub is three RE2 ``replace_substring_regex`` passes, counts are
    ``count_substring_regex``, and the cleaned-text digest runs in the
    embedded DuckDB md5 kernel (one call per batch).

    Output: (doc_id, n_emails, n_phones, n_ips, clean_len, clean_md5)."""
    from ..functions.duck import md5_hex_arrow

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        ids_s = ids.astype(np.str_)
        em = np.char.add(
            np.char.add(" contact user", ids_s), "@example.com"
        )
        ph = np.char.add(
            " call +1-555-", np.char.zfill((ids % 10000).astype(np.str_), 4)
        )
        ip = np.char.add(
            np.char.add(
                np.char.add(" host 10.0.", (ids % 256).astype(np.str_)), "."
            ),
            ((ids * 7) % 256).astype(np.str_),
        )
        mod = ids % 3
        suffix = np.where(mod == 0, em, np.where(mod == 1, ph, ip))
        aug = pc.binary_join_element_wise(
            batch["text"].combine_chunks(),
            pa.array(suffix, type=pa.string()),
            "",
        )
        n_em = pc.count_substring_regex(aug, PII_EMAIL_RE)
        n_ph = pc.count_substring_regex(aug, PII_PHONE_RE)
        n_ip = pc.count_substring_regex(aug, PII_IP_RE)
        clean = pc.replace_substring_regex(aug, PII_EMAIL_RE, "<EMAIL>")
        clean = pc.replace_substring_regex(clean, PII_PHONE_RE, "<PHONE>")
        clean = pc.replace_substring_regex(clean, PII_IP_RE, "<IP>")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_emails": pc.cast(n_em, pa.int64()),
                "n_phones": pc.cast(n_ph, pa.int64()),
                "n_ips": pc.cast(n_ip, pa.int64()),
                "clean_len": pc.cast(pc.utf8_length(clean), pa.int64()),
                "clean_md5": md5_hex_arrow(clean),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


_SQL_TOK = (
    "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok, "
    "generate_subscripts(string_split(text, ' '), 1) AS i FROM documents)"
)
_STOP_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)

ORACLE_SQL: dict[str, str] = {
    "text_quality": f"""
WITH {_SQL_TOK}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
       CAST(count(*) FILTER (tok IN ({_STOP_LIST})) AS BIGINT) AS n_stopwords,
       CAST(max(length(tok)) AS BIGINT) AS max_token_len
FROM tok GROUP BY doc_id
""",
    "text_langid": f"""
WITH {_SQL_TOK},
ns AS (SELECT doc_id, count(*) FILTER (tok IN ({_STOP_LIST})) AS n_stop
       FROM tok GROUP BY doc_id)
SELECT d.doc_id, d.lang,
       CASE WHEN ns.n_stop >= {LANGID_MIN_STOPWORDS} THEN 'en' ELSE 'other' END
         AS lang_guess
FROM documents d JOIN ns ON d.doc_id = ns.doc_id
""",
    # pages adapter contract (sources/pages.py): warc_ts =
    # 2025-01-01T00:00:00Z + doc_id seconds -> epoch minute below
    "trending_tokens": f"""
WITH {_SQL_TOK},
cnt AS (
  SELECT CAST((1735689600 + doc_id) // 60 AS BIGINT) AS minute, tok,
         CAST(count(*) AS BIGINT) AS n
  FROM tok GROUP BY 1, 2
),
lagged AS (
  SELECT c.minute, c.tok, c.n,
         CAST(coalesce(p.n, 0) AS BIGINT) AS n_prev
  FROM cnt c LEFT JOIN cnt p
    ON p.minute = c.minute - 1 AND p.tok = c.tok
),
r AS (
  SELECT minute, tok, n, n_prev, n - n_prev AS delta,
         row_number() OVER (PARTITION BY minute ORDER BY n DESC, tok) AS rk
  FROM lagged
)
SELECT minute, tok, n, n_prev, CAST(delta AS BIGINT) AS delta
FROM r WHERE rk <= {TREND_K}
""",
    "langid_confusion": f"""
WITH {_SQL_TOK},
ns AS (SELECT doc_id, count(*) FILTER (tok IN ({_STOP_LIST})) AS n_stop
       FROM tok GROUP BY doc_id),
g AS (SELECT d.lang,
             CASE WHEN ns.n_stop >= {LANGID_MIN_STOPWORDS}
                  THEN 'en' ELSE 'other' END AS lang_guess
      FROM documents d JOIN ns ON d.doc_id = ns.doc_id)
SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n_docs
FROM g GROUP BY lang, lang_guess
""",
    "text_token_totals": f"""
WITH {_SQL_TOK},
per_doc AS (SELECT doc_id, count(*) AS toks FROM tok GROUP BY doc_id)
SELECT d.source, d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.toks) AS BIGINT) AS n_tokens
FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
GROUP BY d.source, d.lang
""",
    "vocab_top_tokens": f"""
WITH {_SQL_TOK},
cnt AS (
  SELECT d.source, t.tok, CAST(count(*) AS BIGINT) AS n
  FROM tok t JOIN documents d ON d.doc_id = t.doc_id
  GROUP BY d.source, t.tok
),
r AS (
  SELECT source, tok, n,
         row_number() OVER (PARTITION BY source ORDER BY n DESC, tok) AS rk
  FROM cnt
)
SELECT source, tok, n FROM r WHERE rk <= {VOCAB_K}
""",
    "inverted_index": f"""
WITH {_SQL_TOK},
pairs AS (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS phrase
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
g AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS df,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
  FROM pairs GROUP BY phrase)
SELECT phrase, df, postings FROM g WHERE df <= {POSTINGS_DF_CAP}
""",
    "inverted_index_dead_letters": f"""
WITH {_SQL_TOK},
pairs AS (
  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS phrase
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
g AS (SELECT phrase, CAST(count(*) AS BIGINT) AS df FROM pairs GROUP BY phrase)
SELECT phrase, df FROM g WHERE df > {POSTINGS_DF_CAP}
""",
    "tfidf_top_terms": f"""
WITH {_SQL_TOK},
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tok GROUP BY tok),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.tok, tf.tf,
         CAST((1000 * tf.tf * nd.n) // df.df AS BIGINT) AS score_permille,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY (1000 * tf.tf * nd.n) // df.df DESC, tf.tok) AS rk
  FROM tf JOIN df ON df.tok = tf.tok CROSS JOIN nd)
SELECT doc_id, tok, tf, score_permille FROM s WHERE rk <= {TFIDF_K}
""",
    "bigram_collocations": f"""
WITH {_SQL_TOK},
bg AS (
  SELECT a.tok AS w1, b.tok AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy
       FROM bg GROUP BY w1, w2),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY tok),
tot AS (SELECT CAST(count(*) AS BIGINT) AS N FROM tok)
SELECT bc.w1, bc.w2, bc.n_xy,
       CAST((1000 * bc.n_xy * tot.N) // (ux.n * uy.n) AS BIGINT)
         AS lift_permille
FROM bc
JOIN uni ux ON ux.tok = bc.w1
JOIN uni uy ON uy.tok = bc.w2
CROSS JOIN tot
WHERE bc.n_xy >= {COLLOC_MIN_COUNT}
""",
    "bpe_pair_counts": f"""
WITH {_SQL_TOK},
bi AS (
  SELECT substr(tok, j, 2) AS pair
  FROM (SELECT tok, unnest(generate_series(1, length(tok) - 1)) AS j
        FROM tok))
SELECT pair, CAST(count(*) AS BIGINT) AS n_pairs
FROM bi GROUP BY pair
""",
    "text_token_bpeish": f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_WORD}')) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(text, '{_BPE_NUM}')) AS BIGINT) AS n_nums,
       CAST(len(regexp_extract_all(text, '{_BPE_OTHER}')) AS BIGINT) AS n_other
FROM documents
""",
    "text_repetition": f"""
WITH {_SQL_TOK},
bg AS (
  SELECT a.doc_id, a.tok || ' ' || b.tok AS bg
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
c AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(max(c) AS BIGINT) AS max_bigram_count,
       CAST(coalesce(sum(c) FILTER (c > 1), 0) AS BIGINT) AS n_dup_bigrams
FROM c GROUP BY doc_id
""",
    "source_mix_weights": f"""
WITH {_SQL_TOK},
per_doc AS (SELECT doc_id, count(*) AS toks FROM tok GROUP BY doc_id),
per AS (
  SELECT d.source, CAST(sum(p.toks) AS BIGINT) AS n_tokens
  FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
  GROUP BY d.source
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_src FROM per)
SELECT per.source, per.n_tokens,
       CAST((per.n_tokens * 1000) // tot.total AS BIGINT) AS share_permille,
       CAST((tot.total * 1000) // (tot.n_src * per.n_tokens) AS BIGINT)
         AS weight_permille
FROM per CROSS JOIN tot
""",
    "source_lang_mix": """
WITH c AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs,
       CAST((n_docs * 1000) // sum(n_docs) OVER (PARTITION BY source)
         AS BIGINT) AS share_permille
FROM c
""",
    "doc_length_hist": """
SELECT source,
       CAST(length(printf('%b', n_chars + 1)) - 1 AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source, len_bucket
""",
    "source_length_quantiles": """
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source,
  CAST(max(CASE WHEN rk = (n + 9) // 10 THEN n_chars END) AS BIGINT)
    AS p10_chars,
  CAST(max(CASE WHEN rk = (n + 1) // 2 THEN n_chars END) AS BIGINT)
    AS median_chars,
  CAST(max(CASE WHEN rk = (9 * n + 9) // 10 THEN n_chars END) AS BIGINT)
    AS p90_chars
FROM r GROUP BY source
""",
    "source_overlap": f"""
WITH {_SQL_TOK},
sh AS (
  SELECT a.doc_id,
         a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok || ' ' || e.tok
           AS s
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
  JOIN tok d ON a.doc_id = d.doc_id AND d.i = a.i + 3
  JOIN tok e ON a.doc_id = e.doc_id AND e.i = a.i + 4
),
ss AS (
  SELECT DISTINCT d.source, h.s
  FROM sh h JOIN documents d ON d.doc_id = h.doc_id
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
GROUP BY a.source, b.source
""",
    "text_fingerprint": f"""
WITH {_SQL_TOK},
sh AS (
  SELECT a.doc_id,
         a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok || ' ' || e.tok
           AS s
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
  JOIN tok d ON a.doc_id = d.doc_id AND d.i = a.i + 3
  JOIN tok e ON a.doc_id = e.doc_id AND e.i = a.i + 4
)
SELECT doc_id, min(md5(s)) AS fp FROM sh GROUP BY doc_id
""",
}

# plain string (not f-string): regex braces must reach DuckDB verbatim
ORACLE_SQL["pii_scrub"] = r"""
WITH aug AS (
  SELECT doc_id, text || CASE CAST(doc_id % 3 AS INT)
    WHEN 0 THEN ' contact user' || doc_id || '@example.com'
    WHEN 1 THEN printf(' call +1-555-%04d', doc_id % 10000)
    ELSE ' host 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
  END AS t
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(t, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
  CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
      '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g')) AS BIGINT) AS clean_len,
  md5(regexp_replace(regexp_replace(regexp_replace(t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
      '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g')) AS clean_md5
FROM aug
"""


# --- RAG chunking (overlapping token windows) ---------------------------

CHUNK_W = 128  # tokens per chunk
CHUNK_S = 96  # stride (overlap = CHUNK_W - CHUNK_S = 32 tokens)


def rag_chunks(sf_dir: str) -> ray.data.Dataset:
    """Overlapping token-window chunks of every document (RAG prep).

    The retrieval-side analog of the reference's source-slice reader
    (M15, ``code_graph_rag_generator.py`` body-snippet extraction): the
    unit handed to an embedder/retriever is a bounded token window, not
    the whole document.  Chunk ``i`` of a doc covers whitespace tokens
    ``[i*CHUNK_S, i*CHUNK_S + CHUNK_W)``; the last window is short rather
    than padded, and every doc yields at least one chunk.

    Zero exchanges: a single vectorized polars flat transform per batch
    (split -> int_ranges -> explode -> list.slice), embarrassingly
    parallel at any corpus size.

    Output: (doc_id, chunk_id, n_tokens, chunk_text)."""
    import polars as pl

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def chunk(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            pl.col("text").str.split(" ").alias("t")
        )
        df = df.with_columns(pl.col("t").list.len().cast(pl.Int64).alias("n"))
        df = df.with_columns(
            (((pl.col("n") - CHUNK_W).clip(lower_bound=0) + CHUNK_S - 1)
             // CHUNK_S + 1).alias("k")
        )
        df = df.with_columns(
            pl.int_ranges(0, pl.col("k")).alias("chunk_id")
        ).explode("chunk_id")
        df = df.with_columns((pl.col("chunk_id") * CHUNK_S).alias("start"))
        out = df.select(
            pl.col("doc_id"),
            pl.col("chunk_id").cast(pl.Int64),
            pl.min_horizontal(
                pl.lit(CHUNK_W, dtype=pl.Int64), pl.col("n") - pl.col("start")
            ).alias("n_tokens"),
            pl.col("t").list.slice(pl.col("start"), CHUNK_W).list.join(" ")
            .alias("chunk_text"),
        )
        return out.to_arrow()

    return ds.map_batches(chunk, batch_format="pyarrow")


ORACLE_SQL["rag_chunks"] = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
), ex AS (
  SELECT doc_id, t, n,
         unnest(generate_series(
           0, CAST((greatest(n - {CHUNK_W}, 0) + {CHUNK_S} - 1)
                   // {CHUNK_S} AS BIGINT))) AS chunk_id
  FROM toks
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(least({CHUNK_W}, n - chunk_id*{CHUNK_S}) AS BIGINT) AS n_tokens,
       array_to_string(
         list_slice(t, chunk_id*{CHUNK_S} + 1, chunk_id*{CHUNK_S} + {CHUNK_W}),
         ' ') AS chunk_text
FROM ex
"""
