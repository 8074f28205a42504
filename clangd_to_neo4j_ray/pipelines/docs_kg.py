"""Knowledge-graph construction over the ``documents`` table.

This is the driver-checkable materialization of the flagship pipeline: the
same extract -> mention-detect -> link -> canonicalize -> materialize flow as
``pipelines/build_graph.py`` runs on the pages schema, expressed over the
testdata ``documents(doc_id, text, lang, source, n_chars)`` table so every
stage has an exact ANSI-SQL oracle (DuckDB).

Reference correspondences (SURVEY §2):
- mention detection = RefKind-filtered reference scan
  (``clangd_call_graph_builder.py:163-173,213``);
- entity nodes = symbol dedup by content-hash ID, D1
  (``clangd_index_yaml_parser.py:257-258``);
- co-occurrence triples = CallRelation emission + MERGE dedup, D5
  (``clangd_call_graph_builder.py:39-44``);
- node/edge union + orphan cleanup = Passes 3-6 + 8
  (``clangd_graph_rag_builder.py:124-174,200-207``, ``neo4j_manager.py:124-128``);
- graph stats = A1 (``clangd_call_graph_builder.py:52-82``).

Scale notes: every stage is ``map_batches`` over Arrow with a *per-batch
partial aggregate* before the single global ``groupby`` — the salted
two-phase aggregation the north_rule mandates (the batch is the salt), so a
head entity ("the") never concentrates raw rows on one reducer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import entity_ids, entity_ids_arrow
from ..functions.textops import adjacent_pairs, explode_tokens, prefixed
from ..stages.shuffle import grouped_agg, grouped_sum

# ---------------------------------------------------------------------------
# Entity dictionary (side input) — the analog of the reference's symbol table
# keyed by stable content-hash IDs (clangd_index_yaml_parser.py:92-108).
# Fixed vocabulary over the synthetic corpus; kinds mirror Symbol.kind
# (Function/Struct/... -> Op/Obj/Unit/System).
# ---------------------------------------------------------------------------
ENTITY_VOCAB: dict[str, str] = {
    "spark": "System",
    "hash": "Algo",
    "join": "Op",
    "sort": "Op",
    "merge": "Op",
    "filter": "Op",
    "scan": "Op",
    "group": "Op",
    "agg": "Op",
    "window": "Op",
    "order": "Op",
    "batch": "Unit",
    "stream": "Unit",
    "query": "Unit",
    "table": "Obj",
    "column": "Obj",
    "row": "Obj",
    "key": "Obj",
    "data": "Obj",
    "value": "Obj",
    "vector": "Obj",
    "customer": "Obj",
    "line": "Obj",
    "part": "Obj",
}

VOCAB_WORDS = sorted(ENTITY_VOCAB)
_VOCAB_ARRAY = pa.array(VOCAB_WORDS, type=pa.string())
PRED_COOCCURS = "cooccurs_with"

# SQL literal for the vocabulary, reused by every oracle query.
SQL_VOCAB_VALUES = ", ".join(
    f"('{w}', '{ENTITY_VOCAB[w]}')" for w in VOCAB_WORDS
)
SQL_TOK = (
    "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok, "
    "generate_subscripts(string_split(text, ' '), 1) AS i FROM documents)"
)
SQL_VOCAB = f"vocab AS (SELECT * FROM (VALUES {SQL_VOCAB_VALUES}) v(name, kind))"


def _read_documents(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    """Column-pruned read of the documents table (prune at the read)."""
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Stage: mention detection (vectorized explode + dictionary membership)
# ---------------------------------------------------------------------------

def _mention_partials(batch: pa.Table) -> pa.Table:
    """One batch -> partial (doc_id, name, n) counts of vocabulary mentions.

    Vectorized: Arrow split/flatten + is_in mask + Arrow group_by partial
    aggregation.  Emitting partials per batch (instead of raw mention rows)
    is the combiner half of the two-phase aggregation.
    """
    flat, _pos, parents = explode_tokens(batch)
    mask = pc.is_in(flat, value_set=_VOCAB_ARRAY)
    idx = np.nonzero(mask.to_numpy(zero_copy_only=False))[0]
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[parents[idx]]
    t = pa.table(
        {"doc_id": pa.array(doc_ids, type=pa.int64()), "name": flat.take(pa.array(idx))}
    )
    return t.group_by(["doc_id", "name"]).aggregate([([], "count_all")]).rename_columns(
        ["doc_id", "name", "n"]
    )


def kg_mentions(sf_dir: str) -> ray.data.Dataset:
    """Per-document mention counts of dictionary entities.

    Output: (doc_id, entity_id, name, n_mentions).

    ZERO exchanges (r3): a document is one row and ``map_batches`` never
    splits a row across batches, so each batch holds every token of its
    docs and the per-batch (doc_id, name) counts are already globally
    complete — the r2 plan's grouped_sum merged nothing.  The operator is
    a pure streaming scan."""
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    partials = ds.map_batches(_mention_partials, batch_format="pyarrow")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "name", "n_mentions"])

    return partials.map_batches(rename, batch_format="pyarrow").map_batches(
        _add_entity_id_for("name"), batch_format="pyarrow"
    )


def _add_entity_id_for(name_col: str, id_col: str = "entity_id"):
    def add(batch: pa.Table) -> pa.Table:
        ids = entity_ids_arrow(batch[name_col].combine_chunks())
        return batch.append_column(id_col, ids)

    return add


# ---------------------------------------------------------------------------
# Stage: entity canonicalization (D1 symbol dedup analog)
# ---------------------------------------------------------------------------

def kg_entity_nodes(sf_dir: str) -> ray.data.Dataset:
    """Canonical entity nodes with corpus-wide stats.

    Output: (entity_id, name, kind, n_mentions, n_docs).  ``n_docs`` is a
    count-distinct expressed shuffle-free as a count over the per-doc partial
    rows (one row per (doc, name) after the first aggregation).
    """
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    # the per-batch partials are already one complete row per (doc, name)
    # (doc atomicity — see kg_mentions), so the r2 per-doc merge exchange
    # is skipped and the single remaining exchange is the per-entity one
    partials = ds.map_batches(_mention_partials, batch_format="pyarrow")
    per_entity = grouped_agg(
        partials,
        ["name"],
        {"n_mentions": ("n", "sum"), "n_docs": ("n", "size")},
    )

    def finish(batch: pa.Table) -> pa.Table:
        names = batch["name"].to_pylist()
        return pa.table(
            {
                "entity_id": entity_ids_arrow(batch["name"].combine_chunks()),
                "name": batch["name"],
                "kind": pa.array([ENTITY_VOCAB[n] for n in names], type=pa.string()),
                "n_mentions": batch["n_mentions"],
                "n_docs": batch["n_docs"],
            }
        )

    return per_entity.map_batches(finish, batch_format="pyarrow")


def kg_entity_salience(sf_dir: str) -> ray.data.Dataset:
    """Corpus-wide entity salience: mention frequency weighted by how
    early the entity first appears in each document (lead mentions signal
    topicality — the standard position-discounted salience heuristic).

    Output: (entity_id, name, n_docs, n_mentions, salience) where
    ``salience`` = sum over mentioning docs of ``1000 * n_doc_mentions //
    first_pos`` (1-based first token position; integer-exact so the
    oracle comparison is rounding-free).

    Plan: ZERO per-doc exchanges — doc atomicity (see ``kg_mentions``)
    makes the per-batch (doc, name) count+min-position rows globally
    complete, so the per-doc salience term is computed batch-local and
    pre-summed per name; the only exchange ships O(vocab) partial rows
    per block into one ``grouped_agg``."""
    from ..stages.shuffle import grouped_agg

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        flat, pos, parents = explode_tokens(batch)
        mask = pc.is_in(flat, value_set=_VOCAB_ARRAY).to_numpy(
            zero_copy_only=False
        )
        idx = np.nonzero(mask)[0]
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[parents[idx]]
        t = pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "name": flat.take(pa.array(idx)),
                "pos": pa.array(pos[idx] + 1),  # 1-based, as the oracle's i
            }
        )
        per_doc = t.group_by(["doc_id", "name"]).aggregate(
            [([], "count_all"), ("pos", "min")]
        )
        n = per_doc["count_all"].to_numpy(zero_copy_only=False)
        first = per_doc["pos_min"].to_numpy(zero_copy_only=False)
        sal = pa.table(
            {
                "name": per_doc["name"],
                "n_docs": pa.array(np.ones(len(per_doc), dtype=np.int64)),
                "n_mentions": pa.array(n.astype(np.int64)),
                "salience": pa.array((1000 * n) // first),
            }
        )
        return (
            sal.group_by(["name"])
            .aggregate([("n_docs", "sum"), ("n_mentions", "sum"), ("salience", "sum")])
            .rename_columns(["name", "n_docs", "n_mentions", "salience"])
        )

    per_entity = grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["name"],
        {
            "n_docs": ("n_docs", "sum"),
            "n_mentions": ("n_mentions", "sum"),
            "salience": ("salience", "sum"),
        },
    )
    return per_entity.map_batches(
        _add_entity_id_for("name"), batch_format="pyarrow"
    )


TRENDING_ENTITIES_K = 5


def kg_trending_entities(
    sf_dir: str, *, k: int = TRENDING_ENTITIES_K
) -> ray.data.Dataset:
    """Entity mentions on the crawl timeline: the k most-mentioned
    entities of every ``warc_ts`` minute bucket, each with its
    previous-minute count and delta — the KG-freshness monitor (which
    entities are surging in the crawl right now).

    Output: (minute, name, n, n_prev, delta), top-k per minute by
    (n desc, name asc).

    Plan: the ``trending_tokens`` single-exchange lag (per-batch counts
    emitted under both the bucket's own key and ``minute+1`` as carrier
    rows; one grouped_agg recovers the lag with no self-join), restricted
    to vocabulary mentions — the exchange ships O(vocab) rows per minute
    per block."""
    from ..sources.pages import documents_as_pages
    from ..stages.packing import grouped_head_n
    from ..stages.shuffle import grouped_agg

    pages = documents_as_pages(sf_dir)

    def partials(batch: pa.Table) -> pa.Table:
        minute = pc.divide(pc.cast(batch["warc_ts"], pa.int64()), 60_000_000)
        flat, _pos, parents = explode_tokens(batch)
        mask = pc.is_in(flat, value_set=_VOCAB_ARRAY).to_numpy(
            zero_copy_only=False
        )
        idx = np.nonzero(mask)[0]
        t = pa.table(
            {
                "minute": minute.take(pa.array(parents[idx])),
                "name": flat.take(pa.array(idx)),
            }
        )
        cnt = (
            t.group_by(["minute", "name"])
            .aggregate([([], "count_all")])
            .rename_columns(["minute", "name", "n"])
        )
        zeros = pa.array(np.zeros(len(cnt), dtype=np.int64))
        cur = pa.table(
            {"minute": cnt["minute"], "name": cnt["name"], "n": cnt["n"], "n_prev": zeros}
        )
        prv = pa.table(
            {
                "minute": pc.add(cnt["minute"], 1),
                "name": cnt["name"],
                "n": zeros,
                "n_prev": cnt["n"],
            }
        )
        return pa.concat_tables([cur, prv])

    counts = grouped_agg(
        pages.map_batches(partials, batch_format="pyarrow"),
        ["minute", "name"],
        {"n": ("n", "sum"), "n_prev": ("n_prev", "sum")},
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n"], 0))
        return t.append_column("delta", pc.subtract(t["n"], t["n_prev"]))

    ranked = counts.map_batches(finish, batch_format="pyarrow")
    return grouped_head_n(
        ranked,
        "minute",
        ["minute", "n", "name"],
        [True, False, True],
        k,
        out_cols=["minute", "name", "n", "n_prev", "delta"],
    )


# ---------------------------------------------------------------------------
# Stage: triple extraction + canonicalization shuffle (J4 + D5 analogs)
# ---------------------------------------------------------------------------

def _triple_partials(batch: pa.Table) -> pa.Table:
    """Adjacent vocab-token pairs -> partial (w1, w2, evidence_doc, n) rows.

    The pair scan is the spatial-adjacency linking analog (J4,
    clangd_call_graph_builder.py:124-201) done fully vectorized; the partial
    min/count is the combiner for the global MERGE-dedup shuffle (D5).
    """
    flat, _pos, parents = explode_tokens(batch)
    in_vocab = pc.is_in(flat, value_set=_VOCAB_ARRAY).to_numpy(zero_copy_only=False)
    adj = adjacent_pairs(parents)  # indices i where parents[i] == parents[i+1]
    if len(adj):
        both = in_vocab[adj] & in_vocab[adj + 1]
        adj = adj[both]
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[parents[adj]]
    t = pa.table(
        {
            "w1": flat.take(pa.array(adj)),
            "w2": flat.take(pa.array(adj + 1)),
            "doc_id": pa.array(doc_ids, type=pa.int64()),
        }
    )
    out = t.group_by(["w1", "w2"]).aggregate([("doc_id", "min"), ([], "count_all")])
    return out.rename_columns(["w1", "w2", "evidence_doc", "n"])


def kg_triples(sf_dir: str) -> ray.data.Dataset:
    """Canonical deduped (subj, pred, obj) co-occurrence triples.

    Output: (subj, pred, obj, subj_name, obj_name, evidence_doc,
    n_occurrences).  Dedup on (subj, pred, obj) with deterministic min-doc
    evidence witness — the order-independent replacement for the reference's
    last-wins dict semantics (SURVEY §7.5; D5 MERGE idempotency).
    """
    ds = _read_documents(sf_dir, ["doc_id", "text"])
    partials = ds.map_batches(_triple_partials, batch_format="pyarrow")
    agg = grouped_agg(
        partials,
        ["w1", "w2"],
        {"evidence_doc": ("evidence_doc", "min"), "n_occurrences": ("n", "sum")},
    )

    def finish(batch: pa.Table) -> pa.Table:
        w1 = batch["w1"].to_pylist()
        w2 = batch["w2"].to_pylist()
        return pa.table(
            {
                "subj": entity_ids_arrow(batch["w1"].combine_chunks()),
                "pred": pa.repeat(pa.scalar(PRED_COOCCURS), len(w1)),
                "obj": entity_ids_arrow(batch["w2"].combine_chunks()),
                "subj_name": batch["w1"],
                "obj_name": batch["w2"],
                "evidence_doc": batch["evidence_doc"],
                "n_occurrences": batch["n_occurrences"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


COOC_MIN_DOCS = 2  # entity pairs co-mentioned in fewer docs are noise

_SQL_VOCAB_NAMES = ", ".join(f"'{w}'" for w in VOCAB_WORDS)


def kg_cooccurrence(sf_dir: str) -> ray.data.Dataset:
    """Document-level entity relatedness edges — the KG-construction signal
    :func:`kg_triples` (token adjacency) cannot see: entities co-mentioned
    anywhere in the same document, ranked by integer lift
    ``lift_permille = (1000 * n_docs * N) // (nd1 * nd2)`` (the PMI family
    with the log dropped; same discipline as tfidf/collocations so the
    oracle is bit-exact).  Analog of the reference's same-file symbol
    relatedness rollup (clangd_call_graph_builder.py:124-201 generalized
    from spans to the whole document window).

    Output: (e1, e2, w1, w2, n_docs, evidence_doc, lift_permille) with
    w1 < w2 and n_docs >= COOC_MIN_DOCS.

    Plan: ONE scan — per batch a single DuckDB kernel does
    explode -> vocab filter -> distinct (doc, entity) -> within-doc pair
    self-join -> partial pair counts (exact batch-locally: a document is
    one row, so map_batches never splits its tokens).  The pair exchange
    is vocab^2-bounded; per-entity doc frequencies fold in a second
    vocab-bounded exchange and broadcast via ``ray.put`` into the lift
    kernel.  Self-join cost is per-doc O(k^2) in DISTINCT entities per doc
    (k <= vocab), never corpus-wide all-pairs."""
    import ray as _ray

    from ..functions.duck import sql_over

    ds = _read_documents(sf_dir, ["doc_id", "text"])
    n_total = _read_documents(sf_dir, ["doc_id"]).count()

    def pair_partials(batch: pa.Table) -> pa.Table:
        return sql_over(
            f"""WITH m AS (
              SELECT DISTINCT doc_id, tok
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM b)
              WHERE tok IN ({_SQL_VOCAB_NAMES}))
            SELECT a.tok AS w1, c.tok AS w2,
                   CAST(count(*) AS BIGINT) AS n,
                   min(a.doc_id) AS evidence_doc
            FROM m a JOIN m c ON a.doc_id = c.doc_id AND a.tok < c.tok
            GROUP BY a.tok, c.tok""",
            b=batch,
        )

    pairs = grouped_agg(
        ds.map_batches(pair_partials, batch_format="pyarrow"),
        ["w1", "w2"],
        {"n_docs": ("n", "sum"), "evidence_doc": ("evidence_doc", "min")},
    )

    def df_partials(batch: pa.Table) -> pa.Table:
        return sql_over(
            f"""SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM b)
            WHERE tok IN ({_SQL_VOCAB_NAMES}) GROUP BY tok""",
            b=batch,
        )

    ent_df = pa.Table.from_pandas(
        grouped_agg(
            ds.map_batches(df_partials, batch_format="pyarrow"),
            ["tok"],
            {"nd": ("nd", "sum")},
        ).to_pandas()
    )
    ref = _ray.put(ent_df)

    def lift(t: pa.Table) -> pa.Table:
        ed = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        out = sql_over(
            f"""SELECT b.w1, b.w2, b.n_docs, b.evidence_doc,
                  CAST((1000 * b.n_docs * {n_total}) // (ea.nd * eb.nd)
                    AS BIGINT) AS lift_permille
                FROM b
                JOIN e ea ON ea.tok = b.w1
                JOIN e eb ON eb.tok = b.w2
                WHERE b.n_docs >= {COOC_MIN_DOCS}""",
            b=t,
            e=ed,
        )
        return out.append_column(
            "e1", entity_ids_arrow(out["w1"].combine_chunks())
        ).append_column("e2", entity_ids_arrow(out["w2"].combine_chunks()))

    return pairs.map_batches(lift, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Stage: node/edge materialization (Passes 3-6) + orphan cleanup (A8)
# ---------------------------------------------------------------------------

FOLDER_MOD_1 = 7  # first-level folder fan-out of the synthesized doc path
FOLDER_MOD_2 = 3  # second-level folder fan-out

# The documents table has no url column, so the arbitrary-depth hierarchy
# (M9/A6, VERDICT r4 missing #2) is exercised over a DETERMINISTIC
# synthesized path per doc — SQL-expressible so kg_nodes/kg_edges stay
# hash-exact: doc i of source s lives at s/f{i%7}/g{i%3}/doc{i}.  The
# pages pipeline (stages/hierarchy.py) derives the same shape from real
# url path segments.
SQL_FOLDERS = (
    "folders AS (SELECT doc_id, source, "
    f"source || '/f' || CAST(doc_id % {FOLDER_MOD_1} AS VARCHAR) AS f1, "
    f"source || '/f' || CAST(doc_id % {FOLDER_MOD_1} AS VARCHAR) || '/g' || "
    f"CAST(doc_id % {FOLDER_MOD_2} AS VARCHAR) AS f2 FROM documents)"
)


def _folder_cols(batch: pa.Table) -> tuple[pa.Array, pa.Array]:
    """Vectorized (f1, f2) folder-path columns of the synthesized doc path."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    a = pc.cast(pa.array(ids % FOLDER_MOD_1), pa.string())
    b = pc.cast(pa.array(ids % FOLDER_MOD_2), pa.string())
    src = batch["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    f1 = pc.binary_join_element_wise(src, a, "/f")
    f2 = pc.binary_join_element_wise(f1, b, "/g")
    return f1, f2


def kg_nodes(sf_dir: str) -> ray.data.Dataset:
    """Graph node table: SOURCE + FOLDER + PAGE + ENTITY labels, unique on
    node_id.

    ENTITY nodes include only mentioned entities — the orphan-cleanup
    anti-join analog (neo4j_manager.py:124-128) is applied by construction.
    FOLDER nodes are the all-ancestors flat-map (M9,
    clangd_symbol_nodes_builder.py:416-424) over the synthesized doc path
    (two levels deep here; the operator family handles any depth — see
    stages/hierarchy.py for the url-driven form).
    Output: (node_id, label, name).
    """
    docs = _read_documents(sf_dir, ["doc_id", "source"])

    def doc_nodes(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "node_id": pa.array([f"doc:{i}" for i in ids], type=pa.string()),
                "label": pa.repeat(pa.scalar("PAGE"), len(ids)),
                "name": pa.array([f"doc:{i}" for i in ids], type=pa.string()),
            }
        )

    def side_partials(batch: pa.Table) -> pa.Table:
        # SOURCE + FOLDER name partials of the batch, label-tagged and
        # pre-deduped, so both small side tables ride ONE docs scan and
        # ONE distinct exchange (was two scans + two exchanges).
        f1, f2 = _folder_cols(batch)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        t = pa.table(
            {
                "label": pa.concat_arrays(
                    [
                        pa.repeat(pa.scalar("SOURCE"), len(src)),
                        pa.repeat(pa.scalar("FOLDER"), len(f1)),
                        pa.repeat(pa.scalar("FOLDER"), len(f2)),
                    ]
                ),
                "name": pa.concat_arrays([src, f1, f2]),
            }
        )
        return t.group_by(["label", "name"]).aggregate([])

    def side_nodes(b: pa.Table) -> pa.Table:
        label = b["label"]
        if isinstance(label, pa.ChunkedArray):
            label = label.combine_chunks()
        name = b["name"]
        if isinstance(name, pa.ChunkedArray):
            name = name.combine_chunks()
        prefix = pc.if_else(
            pc.equal(label, "SOURCE"),
            pa.scalar("source:"),
            pa.scalar("folder:"),
        )
        return pa.table(
            {
                "node_id": pc.binary_join_element_wise(prefix, name, ""),
                "label": label,
                "name": name,
            }
        )

    from ..stages.shuffle import distinct

    pages = docs.map_batches(doc_nodes, batch_format="pyarrow")
    side = distinct(
        docs.map_batches(side_partials, batch_format="pyarrow"),
        ["label", "name"],
    ).map_batches(side_nodes, batch_format="pyarrow")
    entities = kg_entity_nodes(sf_dir).map_batches(
        lambda b: pa.table(
            {
                "node_id": b["entity_id"],
                "label": pa.repeat(pa.scalar("ENTITY"), len(b)),
                "name": b["name"],
            }
        ),
        batch_format="pyarrow",
    )
    return pages.union(side).union(entities)


def _fused_edge_partials(batch: pa.Table) -> pa.Table:
    """ONE tokenize pass -> both MENTIONS partials and cooccurrence pair
    partials, schema-harmonized so both kinds ride the SAME exchange.

    Mention rows key on (is_pair=0, w1, w2="", doc_g=doc_id) — per-doc
    singleton groups (doc atomicity, see kg_mentions), so the exchange's
    min/sum are identities for them; pair rows key on (is_pair=1, w1, w2,
    doc_g=0) and merge globally with min-doc evidence, exactly the
    kg_triples plan.  This drops the second full corpus tokenize kg_edges
    used to pay (kg_mentions and kg_triples each re-scanned the text) for
    the price of O(doc x vocab-hit) extra small rows in one exchange."""
    flat, _pos, parents = explode_tokens(batch)
    in_vocab = pc.is_in(flat, value_set=_VOCAB_ARRAY).to_numpy(
        zero_copy_only=False
    )
    doc_ids_all = batch["doc_id"].to_numpy(zero_copy_only=False)

    idx = np.nonzero(in_vocab)[0]
    m = (
        pa.table(
            {
                "doc_g": pa.array(doc_ids_all[parents[idx]], type=pa.int64()),
                "w1": flat.take(pa.array(idx)),
            }
        )
        .group_by(["doc_g", "w1"])
        .aggregate([([], "count_all")])
        .rename_columns(["doc_g", "w1", "n"])
    )

    adj = adjacent_pairs(parents)
    if len(adj):
        both = in_vocab[adj] & in_vocab[adj + 1]
        adj = adj[both]
    p = (
        pa.table(
            {
                "w1": flat.take(pa.array(adj)),
                "w2": flat.take(pa.array(adj + 1)),
                "doc_id": pa.array(
                    doc_ids_all[parents[adj]], type=pa.int64()
                ),
            }
        )
        .group_by(["w1", "w2"])
        .aggregate([("doc_id", "min"), ([], "count_all")])
        .rename_columns(["w1", "w2", "evidence", "n"])
    )

    n_m, n_p = len(m), len(p)
    return pa.table(
        {
            "is_pair": pa.array(
                np.concatenate(
                    [np.zeros(n_m, np.int64), np.ones(n_p, np.int64)]
                )
            ),
            "w1": pa.concat_arrays(
                [m["w1"].combine_chunks(), p["w1"].combine_chunks()]
            ),
            "w2": pa.concat_arrays(
                [pa.repeat(pa.scalar(""), n_m), p["w2"].combine_chunks()]
            ),
            "doc_g": pa.concat_arrays(
                [
                    m["doc_g"].combine_chunks(),
                    pa.array(np.zeros(n_p, np.int64)),
                ]
            ),
            "evidence": pa.concat_arrays(
                [m["doc_g"].combine_chunks(), p["evidence"].combine_chunks()]
            ),
            "n": pa.concat_arrays(
                [m["n"].combine_chunks(), p["n"].combine_chunks()]
            ),
        }
    )


def kg_edges(sf_dir: str) -> ray.data.Dataset:
    """Graph edge table, unique on (src, type, dst), with occurrence weight.

    CONTAINS (source->folder->folder->doc) = hierarchy edges, one edge per
    level of the all-ancestors chain (clangd_symbol_nodes_builder.py:502-569
    + the :416-424 ancestor walk; VERDICT r4 missing #2 — was one level);
    MENTIONS (doc->entity) = DEFINES analog (:210-220);
    cooccurs_with (entity->entity) = CALLS analog (clangd_call_graph_builder.py:39-44).
    Output: (src, type, dst, n).

    MENTIONS and cooccurs_with derive from one fused tokenize scan and one
    shared exchange (see _fused_edge_partials) instead of re-running the
    kg_mentions and kg_triples scans separately.
    """
    from ..stages.shuffle import distinct

    docs = _read_documents(sf_dir, ["doc_id", "source"])

    def _edge_table(src: pa.Array, dst: pa.Array) -> pa.Table:
        return pa.table(
            {
                "src": src,
                "type": pa.repeat(pa.scalar("CONTAINS"), len(src)),
                "dst": dst,
                "n": pa.array(np.ones(len(src), dtype=np.int64)),
            }
        )

    def _prefixed(prefix: str, arr: pa.Array) -> pa.Array:
        return pc.binary_join_element_wise(pa.scalar(prefix), arr, ":")

    def leaf_contains(batch: pa.Table) -> pa.Table:
        _f1, f2 = _folder_cols(batch)
        ids = batch["doc_id"].to_pylist()
        return _edge_table(
            _prefixed("folder", f2),
            pa.array([f"doc:{i}" for i in ids], type=pa.string()),
        )

    def ancestor_partials(batch: pa.Table) -> pa.Table:
        # distinct (parent, child) chain links of the batch: source->f1
        # and f1->f2 (bounded by distinct folders, never by doc count)
        f1, f2 = _folder_cols(batch)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        t = pa.table(
            {
                "src": pa.concat_arrays(
                    [_prefixed("source", src), _prefixed("folder", f1)]
                ),
                "dst": pa.concat_arrays(
                    [_prefixed("folder", f1), _prefixed("folder", f2)]
                ),
            }
        )
        return t.group_by(["src", "dst"]).aggregate([]).rename_columns(
            ["src", "dst"]
        )

    ancestor_ds = distinct(
        docs.map_batches(ancestor_partials, batch_format="pyarrow"),
        ["src", "dst"],
    ).map_batches(
        lambda t: _edge_table(
            t["src"].combine_chunks(), t["dst"].combine_chunks()
        ),
        batch_format="pyarrow",
    )
    contains_ds = docs.map_batches(
        leaf_contains, batch_format="pyarrow"
    ).union(ancestor_ds)

    fused = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        _fused_edge_partials, batch_format="pyarrow"
    )
    merged = grouped_agg(
        fused,
        ["is_pair", "w1", "w2", "doc_g"],
        {"evidence": ("evidence", "min"), "n": ("n", "sum")},
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        ip = pc.equal(batch["is_pair"], 1)
        w1_ids = entity_ids_arrow(batch["w1"].combine_chunks())
        w2_ids = entity_ids_arrow(batch["w2"].combine_chunks())
        return pa.table(
            {
                "src": pc.if_else(
                    ip, w1_ids, prefixed(batch["doc_g"], "doc:")
                ),
                "type": pc.if_else(
                    ip, pa.scalar(PRED_COOCCURS), pa.scalar("MENTIONS")
                ),
                "dst": pc.if_else(ip, w2_ids, w1_ids),
                "n": batch["n"],
            }
        )

    return contains_ds.union(
        merged.map_batches(to_edges, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Stage: per-source rollup (hierarchy aggregate, A5/A6 analog)
# ---------------------------------------------------------------------------

def kg_sources(sf_dir: str) -> ray.data.Dataset:
    """Per-source rollup: doc count, token totals, mention-token totals.

    Output: (source, n_docs, n_tokens, n_mention_tokens).  The folder-rollup
    analog (code_graph_rag_generator.py:368-423) without the LLM: group
    children stats up one hierarchy level.
    """
    ds = _read_documents(sf_dir, ["doc_id", "source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        flat, _pos, parents = explode_tokens(batch)
        in_vocab = pc.is_in(flat, value_set=_VOCAB_ARRAY).to_numpy(
            zero_copy_only=False
        )
        srcs = batch["source"].to_numpy(zero_copy_only=False)
        n_rows = len(batch)
        tok_counts = np.bincount(parents, minlength=n_rows)
        mention_counts = np.bincount(
            parents[in_vocab], minlength=n_rows
        )
        t = pa.table(
            {
                "source": batch["source"],
                "docs": pa.array(np.ones(n_rows, dtype=np.int64)),
                "toks": pa.array(tok_counts.astype(np.int64)),
                "ments": pa.array(mention_counts.astype(np.int64)),
            }
        )
        out = t.group_by("source").aggregate(
            [("docs", "sum"), ("toks", "sum"), ("ments", "sum")]
        )
        return out.rename_columns(["source", "docs", "toks", "ments"])

    return grouped_sum(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["source"],
        {"docs": "n_docs", "toks": "n_tokens", "ments": "n_mention_tokens"},
    )


def kg_mention_windows(sf_dir: str) -> ray.data.Dataset:
    """Token context window around every vocabulary mention.

    Output: (doc_id, i, prev_tok, tok, next_tok) — 1-based token position
    ``i`` (matching SQL generate_subscripts); empty string at document
    edges.  The source-slice reader analog (M15,
    ``code_graph_rag_generator.py:506-522``): recover surrounding context
    for a located reference without re-reading the source.
    """
    ds = _read_documents(sf_dir, ["doc_id", "text"])

    def windows(batch: pa.Table) -> pa.Table:
        flat, pos, parents = explode_tokens(batch)
        toks = np.asarray(flat.to_pylist(), dtype=object)
        in_vocab = pc.is_in(flat, value_set=_VOCAB_ARRAY).to_numpy(
            zero_copy_only=False
        )
        idx = np.nonzero(in_vocab)[0]
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[parents[idx]]
        prev_ok = (idx - 1 >= 0) & (
            parents[np.maximum(idx - 1, 0)] == parents[idx]
        )
        next_ok = (idx + 1 < len(toks)) & (
            parents[np.minimum(idx + 1, len(toks) - 1)] == parents[idx]
        )
        prev_tok = np.where(prev_ok, toks[np.maximum(idx - 1, 0)], "")
        next_tok = np.where(next_ok, toks[np.minimum(idx + 1, len(toks) - 1)], "")
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "i": pa.array(pos[idx] + 1, type=pa.int64()),
                "prev_tok": pa.array(prev_tok, type=pa.string()),
                "tok": pa.array(toks[idx], type=pa.string()),
                "next_tok": pa.array(next_tok, type=pa.string()),
            }
        )

    return ds.map_batches(windows, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Stage: graph statistics (A1 analog) — small final aggregate
# ---------------------------------------------------------------------------

def kg_stats(sf_dir: str):
    """Call-graph-statistics analog over the deduped triple set.

    Output single row: (n_triples, n_subjects, n_objects, n_recursive,
    n_entry_points, n_leaves).  Entry points = subjects never appearing as
    objects; leaves = objects never appearing as subjects; recursive = subj ==
    obj (clangd_call_graph_builder.py:52-82).

    Fully distributed (VERDICT r3 #3 — the previous plan collected the whole
    triple set to the driver, and |vocab|^2 is NOT driver-sized for a
    production dictionary): the deduped (subj, obj) pair set is materialized
    once in the object store, per-batch partials reduce it to one count row
    per block, and the subject/object role flags go through one bucketed
    exchange keyed on name.  The only driver-side collections are O(blocks)
    partial-count rows and the O(blocks) flag partials — never the triples.
    """
    from ..stages.shuffle import grouped_agg

    pairs = (
        kg_triples(sf_dir)
        .select_columns(["subj_name", "obj_name"])
        .materialize()  # two passes below; avoids lineage re-execution
    )

    def count_partials(batch: pa.Table) -> pa.Table:
        rec = pc.sum(
            pc.cast(pc.equal(batch["subj_name"], batch["obj_name"]), pa.int64())
        ).as_py()
        return pa.table(
            {
                "n": pa.array([len(batch)], type=pa.int64()),
                "rec": pa.array([int(rec or 0)], type=pa.int64()),
            }
        )

    cp = pairs.map_batches(count_partials, batch_format="pyarrow").take_all()
    n_triples = sum(r["n"] for r in cp)
    n_recursive = sum(r["rec"] for r in cp)

    def role_partials(batch: pa.Table) -> pa.Table:
        # per-batch distinct (name, role) flags — the combiner before the
        # one name-keyed exchange
        t = pa.concat_tables(
            [
                pa.table(
                    {
                        "name": batch["subj_name"],
                        "is_sub": pa.array(
                            np.ones(len(batch), dtype=np.int64)
                        ),
                        "is_obj": pa.array(
                            np.zeros(len(batch), dtype=np.int64)
                        ),
                    }
                ),
                pa.table(
                    {
                        "name": batch["obj_name"],
                        "is_sub": pa.array(
                            np.zeros(len(batch), dtype=np.int64)
                        ),
                        "is_obj": pa.array(
                            np.ones(len(batch), dtype=np.int64)
                        ),
                    }
                ),
            ]
        )
        return (
            t.group_by("name")
            .aggregate([("is_sub", "max"), ("is_obj", "max")])
            .rename_columns(["name", "is_sub", "is_obj"])
        )

    flags = grouped_agg(
        pairs.map_batches(role_partials, batch_format="pyarrow"),
        ["name"],
        {"is_sub": ("is_sub", "max"), "is_obj": ("is_obj", "max")},
    )

    def flag_partials(batch: pa.Table) -> pa.Table:
        s = batch["is_sub"].to_numpy(zero_copy_only=False).astype(bool)
        o = batch["is_obj"].to_numpy(zero_copy_only=False).astype(bool)
        return pa.table(
            {
                "subs": pa.array([int(s.sum())], type=pa.int64()),
                "objs": pa.array([int(o.sum())], type=pa.int64()),
                "entry": pa.array([int((s & ~o).sum())], type=pa.int64()),
                "leaf": pa.array([int((o & ~s).sum())], type=pa.int64()),
            }
        )

    fp = flags.map_batches(flag_partials, batch_format="pyarrow").take_all()
    return pa.table(
        {
            "n_triples": pa.array([n_triples], type=pa.int64()),
            "n_subjects": pa.array([sum(r["subs"] for r in fp)], type=pa.int64()),
            "n_objects": pa.array([sum(r["objs"] for r in fp)], type=pa.int64()),
            "n_recursive": pa.array([n_recursive], type=pa.int64()),
            "n_entry_points": pa.array(
                [sum(r["entry"] for r in fp)], type=pa.int64()
            ),
            "n_leaves": pa.array([sum(r["leaf"] for r in fp)], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (exact parity with the Ray implementations above)
# ---------------------------------------------------------------------------

ORACLE_SQL: dict[str, str] = {
    "kg_mentions": f"""
WITH {SQL_TOK}, {SQL_VOCAB}
SELECT t.doc_id, substr(md5(t.tok), 1, 16) AS entity_id, t.tok AS name,
       CAST(count(*) AS BIGINT) AS n_mentions
FROM tok t JOIN vocab v ON t.tok = v.name
GROUP BY t.doc_id, t.tok
""",
    "kg_entity_nodes": f"""
WITH {SQL_TOK}, {SQL_VOCAB}
SELECT substr(md5(t.tok), 1, 16) AS entity_id, t.tok AS name, v.kind,
       CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs
FROM tok t JOIN vocab v ON t.tok = v.name
GROUP BY t.tok, v.kind
""",
    # pages adapter contract: warc_ts = 2025-01-01Z + doc_id seconds
    "kg_trending_entities": f"""
WITH {SQL_TOK}, {SQL_VOCAB},
cnt AS (
  SELECT CAST((1735689600 + t.doc_id) // 60 AS BIGINT) AS minute,
         t.tok AS name, CAST(count(*) AS BIGINT) AS n
  FROM tok t JOIN vocab v ON t.tok = v.name
  GROUP BY 1, 2
),
lagged AS (
  SELECT c.minute, c.name, c.n,
         CAST(coalesce(p.n, 0) AS BIGINT) AS n_prev
  FROM cnt c LEFT JOIN cnt p
    ON p.minute = c.minute - 1 AND p.name = c.name
),
r AS (
  SELECT minute, name, n, n_prev, n - n_prev AS delta,
         row_number() OVER (PARTITION BY minute ORDER BY n DESC, name) AS rk
  FROM lagged
)
SELECT minute, name, n, n_prev, CAST(delta AS BIGINT) AS delta
FROM r WHERE rk <= {TRENDING_ENTITIES_K}
""",
    "kg_entity_salience": f"""
WITH {SQL_TOK}, {SQL_VOCAB},
m AS (
  SELECT t.doc_id, t.tok AS name, CAST(count(*) AS BIGINT) AS n,
         CAST(min(t.i) AS BIGINT) AS first_pos
  FROM tok t JOIN vocab v ON t.tok = v.name
  GROUP BY t.doc_id, t.tok
)
SELECT substr(md5(name), 1, 16) AS entity_id, name,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_mentions,
       CAST(sum((1000 * n) // first_pos) AS BIGINT) AS salience
FROM m GROUP BY name
""",
    "kg_triples": f"""
WITH {SQL_TOK}, {SQL_VOCAB},
pairs AS (
  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.tok IN (SELECT name FROM vocab) AND b.tok IN (SELECT name FROM vocab)
)
SELECT substr(md5(w1), 1, 16) AS subj, '{PRED_COOCCURS}' AS pred,
       substr(md5(w2), 1, 16) AS obj, w1 AS subj_name, w2 AS obj_name,
       min(doc_id) AS evidence_doc, CAST(count(*) AS BIGINT) AS n_occurrences
FROM pairs GROUP BY w1, w2
""",
    "kg_cooccurrence": f"""
WITH {SQL_TOK}, {SQL_VOCAB},
m AS (SELECT DISTINCT t.doc_id, t.tok FROM tok t
      WHERE t.tok IN (SELECT name FROM vocab)),
p AS (SELECT a.tok AS w1, b.tok AS w2,
             CAST(count(*) AS BIGINT) AS n_docs,
             min(a.doc_id) AS evidence_doc
      FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY a.tok, b.tok),
ed AS (SELECT tok, CAST(count(*) AS BIGINT) AS nd FROM m GROUP BY tok),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT substr(md5(p.w1), 1, 16) AS e1, substr(md5(p.w2), 1, 16) AS e2,
       p.w1, p.w2, p.n_docs, p.evidence_doc,
       CAST((1000 * p.n_docs * nd.n) // (ea.nd * eb.nd) AS BIGINT)
         AS lift_permille
FROM p JOIN ed ea ON ea.tok = p.w1 JOIN ed eb ON eb.tok = p.w2 CROSS JOIN nd
WHERE p.n_docs >= {COOC_MIN_DOCS}
""",
    "kg_nodes": f"""
WITH {SQL_TOK}, {SQL_VOCAB}, {SQL_FOLDERS}
SELECT 'doc:' || doc_id AS node_id, 'PAGE' AS label, 'doc:' || doc_id AS name
FROM documents
UNION ALL
SELECT DISTINCT 'source:' || source, 'SOURCE', source FROM documents
UNION ALL
SELECT DISTINCT 'folder:' || f1, 'FOLDER', f1 FROM folders
UNION ALL
SELECT DISTINCT 'folder:' || f2, 'FOLDER', f2 FROM folders
UNION ALL
SELECT DISTINCT substr(md5(t.tok), 1, 16), 'ENTITY', t.tok
FROM tok t WHERE t.tok IN (SELECT name FROM vocab)
""",
    "kg_edges": f"""
WITH {SQL_TOK}, {SQL_VOCAB}, {SQL_FOLDERS},
pairs AS (
  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.tok IN (SELECT name FROM vocab) AND b.tok IN (SELECT name FROM vocab)
)
SELECT 'folder:' || f2 AS src, 'CONTAINS' AS type, 'doc:' || doc_id AS dst,
       CAST(1 AS BIGINT) AS n
FROM folders
UNION ALL
SELECT DISTINCT 'source:' || source, 'CONTAINS', 'folder:' || f1,
       CAST(1 AS BIGINT)
FROM folders
UNION ALL
SELECT DISTINCT 'folder:' || f1, 'CONTAINS', 'folder:' || f2,
       CAST(1 AS BIGINT)
FROM folders
UNION ALL
SELECT 'doc:' || doc_id, 'MENTIONS', substr(md5(tok), 1, 16),
       CAST(count(*) AS BIGINT)
FROM tok WHERE tok IN (SELECT name FROM vocab) GROUP BY doc_id, tok
UNION ALL
SELECT substr(md5(w1), 1, 16), '{PRED_COOCCURS}', substr(md5(w2), 1, 16),
       CAST(count(*) AS BIGINT)
FROM pairs GROUP BY w1, w2
""",
    "kg_sources": f"""
WITH {SQL_TOK}, {SQL_VOCAB},
per_doc AS (
  SELECT t.doc_id, count(*) AS toks,
         count(*) FILTER (t.tok IN (SELECT name FROM vocab)) AS ments
  FROM tok t GROUP BY t.doc_id
)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.toks) AS BIGINT) AS n_tokens,
       CAST(sum(p.ments) AS BIGINT) AS n_mention_tokens
FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
GROUP BY d.source
""",
    "kg_mention_windows": f"""
WITH {SQL_TOK}, {SQL_VOCAB}
SELECT t.doc_id, CAST(t.i AS BIGINT) AS i,
       coalesce(p.tok, '') AS prev_tok, t.tok,
       coalesce(nx.tok, '') AS next_tok
FROM tok t
LEFT JOIN tok p ON p.doc_id = t.doc_id AND p.i = t.i - 1
LEFT JOIN tok nx ON nx.doc_id = t.doc_id AND nx.i = t.i + 1
WHERE t.tok IN (SELECT name FROM vocab)
""",
    "kg_stats": f"""
WITH {SQL_TOK}, {SQL_VOCAB},
pairs AS (
  SELECT a.tok AS w1, b.tok AS w2
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.tok IN (SELECT name FROM vocab) AND b.tok IN (SELECT name FROM vocab)
),
triples AS (SELECT w1, w2 FROM pairs GROUP BY w1, w2)
SELECT CAST((SELECT count(*) FROM triples) AS BIGINT) AS n_triples,
       CAST((SELECT count(DISTINCT w1) FROM triples) AS BIGINT) AS n_subjects,
       CAST((SELECT count(DISTINCT w2) FROM triples) AS BIGINT) AS n_objects,
       CAST((SELECT count(*) FROM triples WHERE w1 = w2) AS BIGINT) AS n_recursive,
       CAST((SELECT count(DISTINCT w1) FROM triples
             WHERE w1 NOT IN (SELECT w2 FROM triples)) AS BIGINT) AS n_entry_points,
       CAST((SELECT count(DISTINCT w2) FROM triples
             WHERE w2 NOT IN (SELECT w1 FROM triples)) AS BIGINT) AS n_leaves
""",
}
