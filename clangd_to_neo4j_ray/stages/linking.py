"""Stages M+L: mention detection and entity linking (stateful actor pool).

The analog of the reference's reference-scan + caller-resolution passes:

- mention detection = RefKind-filtered reference collection
  (``clangd_call_graph_builder.py:163-173``): dictionary surfaces are found
  with 0-indexed [start, end) spans, the ``Location`` analog
  (``clangd_index_yaml_parser.py:30-46``).
- anchored linking = Container-field caller resolution
  (``clangd_call_graph_builder.py:203-227``): the sentence's explicit subject.
- context linking = spatial-containment resolution
  (``clangd_call_graph_builder.py:124-201``): a pronoun subject resolves to
  the nearest preceding anchored subject in the same page — deterministic
  first-match-in-document-order, the parallel-safe replacement for the
  reference's sorted-span linear scan with ``break``.

Four scan strategies (the ``--source-parser {clang,treesitter}`` strategy
surface analog, ``compilation_manager.py:113-123``):

- ``token`` (default): token-anchored dictionary scan — aliases are token
  sequences; a first-token hash lookup prunes almost every position, then
  candidates are verified longest-first.  ~10x faster than the regex path
  (CPython ``re`` alternation tries each branch per position).  Assumes
  dictionary surfaces are whole-token sequences with only edge punctuation
  (true for natural-language entity aliases).
- ``regex``: single longest-first alternation with hard non-alnum
  boundaries — the reference semantics the oracle implements; used by the
  P/R tests to prove the token path equivalent on the fixture.
- ``vector`` (linking_vec.py): Arrow/numpy batch-vectorized token scan.
- ``ac`` (linking_ac.py): polars Rust Aho-Corasick over the whole batch,
  regex-exact boundaries/greedy (covers punctuation the token scan's
  whole-token assumption does not).  Measured ~15% slower than ``token``
  at the bench dictionary size (post-filtering overlapping hits in Python
  dominates), but its automaton scan cost is independent of alias count —
  the strategy of record for very large dictionaries.

The linker is a callable CLASS: the dictionary index is built once per actor
from a broadcast object ref (``ray.put`` once on the driver), mirroring the
reference's per-process ``_worker_impl_instance`` initializer (T1,
``compilation_parser.py:161-187``).  Unresolvable pronoun sentences become
dead-letter rows (pred='__dead_letter__'), not silent drops — SURVEY §7.5.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray
import ray.data

from ..context import DEFAULT_BATCH_SIZE, default_pool_size

PRED_PHRASES = {
    "works for": "works_for",
    "is located in": "located_in",
    "is affiliated with": "affiliated_with",
    "links to": "links_to",
}
DEAD_LETTER = "__dead_letter__"
_SENTENCE_SPLIT = re.compile(r"(?<=\.) ")
_EDGE_PUNCT = ".,;:!?\"'()[]"


def compile_alias_regex(aliases) -> re.Pattern:
    """Single alternation over all surfaces, longest-first so the regex
    engine's leftmost-alternative preference yields longest-match semantics
    (e.g. 'The Entity0001' beats its substring 'Entity0001')."""
    ordered = sorted(aliases, key=len, reverse=True)
    return re.compile(
        r"(?<![A-Za-z0-9])(" + "|".join(re.escape(a) for a in ordered) + r")(?![A-Za-z0-9])"
    )


def build_token_index(aliases) -> dict[str, list[tuple[list[str], str]]]:
    """first token -> [(alias tokens, alias surface)], longest first."""
    idx: dict[str, list[tuple[list[str], str]]] = {}
    for a in aliases:
        toks = a.split(" ")
        idx.setdefault(toks[0], []).append((toks, a))
    for lst in idx.values():
        lst.sort(key=lambda t: len(t[0]), reverse=True)
    return idx


def _assemble(triples: list, mentions: list):
    """Row tuples -> (candidate table, mention table), one zip transpose
    per table (no per-field append loops)."""
    if triples:
        subj, pred, obj, eurl, s_arr, e_arr = zip(*triples)
    else:
        subj = pred = obj = eurl = s_arr = e_arr = ()
    cand_tbl = pa.table(
        {
            "subj": pa.array(subj, type=pa.string()),
            "pred": pa.array(pred, type=pa.string()),
            "obj": pa.array(obj, type=pa.string()),
            "evidence_url": pa.array(eurl, type=pa.string()),
            "evidence_start": pa.array(s_arr, type=pa.int32()),
            "evidence_end": pa.array(e_arr, type=pa.int32()),
        }
    )
    if mentions:
        m_url, m_eid, m_surf, m_s, m_e, m_anch = zip(*mentions)
    else:
        m_url = m_eid = m_surf = m_s = m_e = m_anch = ()
    ment_tbl = pa.table(
        {
            "url": pa.array(m_url, type=pa.string()),
            "entity_id": pa.array(m_eid, type=pa.string()),
            "surface": pa.array(m_surf, type=pa.string()),
            "start": pa.array(m_s, type=pa.int32()),
            "end": pa.array(m_e, type=pa.int32()),
            "anchored": pa.array(m_anch, type=pa.bool_()),
        }
    )
    return cand_tbl, ment_tbl


_TAG_COLUMNS = [
    "kind", "subj", "pred", "obj", "evidence_url",
    "url", "entity_id", "surface", "start", "end", "anchored",
]


def _tag_union(cand: pa.Table, ment: pa.Table) -> pa.Table:
    """Arrow-native tagged union of candidate and mention rows: concat with
    column promotion null-pads the missing side — no ``to_pylist`` round
    trip (the old ``pad`` helper was ~30% of the whole scan stage)."""
    c = cand.select(["subj", "pred", "obj", "evidence_url"]).append_column(
        "kind", pa.array(["triple"] * cand.num_rows, type=pa.string())
    )
    m = ment.append_column(
        "kind", pa.array(["mention"] * ment.num_rows, type=pa.string())
    )
    out = pa.concat_tables([c, m], promote_options="default")
    return out.select(_TAG_COLUMNS)


class EntityLinker:
    """Actor-pool stage: text -> (mentions, candidate triples) per batch.

    ``alias_ref`` is a ``ray.ObjectRef`` to the alias->entity_id dict
    (broadcast side input; no shuffle join for the small side, SURVEY §7.4).
    """

    def __init__(self, alias_ref, strategy: str = "token"):
        lut = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        self.lut: dict[str, str] = lut
        self.strategy = strategy
        if strategy == "regex":
            self.pattern = compile_alias_regex(lut.keys())
        else:
            self.index = build_token_index(lut.keys())

    # -- scan: find dictionary surfaces with [start, end) char spans --

    def _scan_regex(self, sent: str, base: int):
        return [
            (m.start() + base, m.end() + base, m.group(1))
            for m in self.pattern.finditer(sent)
        ]

    def _scan_token(self, sent: str, base: int):
        toks = sent.split(" ")
        # char offset of each token within the sentence
        offs = []
        run = 0
        for t in toks:
            offs.append(run)
            run += len(t) + 1
        found = []
        index = self.index
        i = 0
        n = len(toks)
        while i < n:
            raw = toks[i]
            lead = 0
            while lead < len(raw) and raw[lead] in _EDGE_PUNCT:
                lead += 1
            core = raw[lead:].rstrip(_EDGE_PUNCT)
            cands = index.get(core)
            matched = False
            if cands:
                for alias_toks, alias in cands:
                    k = len(alias_toks)
                    if i + k > n:
                        continue
                    # a multi-token alias's FIRST token must carry no
                    # trailing punctuation: 'New, York' must not match
                    # 'New York' (the rstripped core is only a lookup key)
                    if k > 1 and raw[lead:] != alias_toks[0]:
                        continue
                    ok = True
                    # middle tokens must match exactly; last token may carry
                    # trailing punctuation (first may carry leading)
                    for j in range(1, k):
                        tj = toks[i + j]
                        cj = tj.rstrip(_EDGE_PUNCT) if j == k - 1 else tj
                        if cj != alias_toks[j]:
                            ok = False
                            break
                    if ok:
                        start = base + offs[i] + lead
                        found.append((start, start + len(alias), alias))
                        i += k
                        matched = True
                        break
            if not matched:
                i += 1
        return found

    def scan(self, sent: str, base: int):
        if self.strategy == "regex":
            return self._scan_regex(sent, base)
        return self._scan_token(sent, base)

    # -- per-document link pass: one scan, both outputs --

    def link_text(self, url: str, text: str, want_mentions: bool = True):
        """Returns (mention_rows, triple_rows) for one document."""
        sentence_founds = []
        offset = 0
        for sent in _SENTENCE_SPLIT.split(text):
            sentence_founds.append((offset, self.scan(sent, offset)))
            offset += len(sent) + 1  # +1 for the split space
        return self.doc_relations(url, text, sentence_founds, want_mentions)

    def resolve(self, alias: str, doc_eids: set[str]) -> str:
        """Dictionary + context-scored entity resolution.

        Unambiguous surfaces map directly.  An ambiguous surface (a list of
        (entity_id, canonical) candidates) resolves to the first candidate
        (ascending entity_id) that is unambiguously mentioned elsewhere on
        the same page — the context score — falling back deterministically
        to the min-id candidate.  This is the web analog of the reference's
        Container-vs-spatial caller disambiguation (SURVEY §2.4 J3/J4)."""
        v = self.lut[alias]
        if isinstance(v, str):
            return v
        for eid, _canonical in v:
            if eid in doc_eids:
                return eid
        return v[0][0]

    def doc_relations(self, url: str, text: str, sentence_founds, want_mentions=True):
        """Shared relation logic given per-sentence mention spans.

        ``sentence_founds``: [(sent_start_char, [(start, end, alias), ...])]
        in document order.  Spans are absolute char offsets into ``text``.
        Sentences without mentions may be omitted (they affect nothing).
        ``want_mentions=False`` skips mention-row assembly (the
        candidates-only hot path: mention rows are ~10x the triple rows)."""
        # pass 1: page-context entity set from unambiguous mentions
        doc_eids = {
            v
            for _ss, found in sentence_founds
            for (_s, _e, a) in found
            if isinstance((v := self.lut[a]), str)
        }
        mentions = []  # (url, entity_id, surface, start, end, anchored)
        triples = []  # (subj, pred, obj, url, start, end)
        last_subject: str | None = None
        for ss, found in sentence_founds:
            anchored_idx = -1
            if len(found) == 2:
                # candidate anchored relation: "<A> <phrase> <B>."
                (s0, e0, a0), (s1, e1, a1) = found
                pred = PRED_PHRASES.get(text[e0:s1].strip())
                if pred is not None:
                    subj = self.resolve(a0, doc_eids)
                    obj = self.resolve(a1, doc_eids)
                    triples.append((subj, pred, obj, url, s0, e1))
                    last_subject = subj
                    anchored_idx = 0
            elif len(found) == 1 and text[ss : ss + 3] == "It ":
                s1, e1, a1 = found[0]
                pred = PRED_PHRASES.get(text[ss + 3 : s1].strip())
                if pred is not None:
                    obj = self.resolve(a1, doc_eids)
                    if last_subject is not None:
                        triples.append((last_subject, pred, obj, url, s1, e1))
                    else:
                        # dead-letter: unresolvable context (drop-vs-error)
                        triples.append((None, DEAD_LETTER, obj, url, s1, e1))
            if want_mentions:
                for k, (s, e, a) in enumerate(found):
                    mentions.append(
                        (url, self.resolve(a, doc_eids), a, s, e, k == anchored_idx)
                    )
        return mentions, triples

    def _tables(self, batch: pa.Table, want_mentions: bool = True):
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        all_m, all_t = [], []
        for url, text in zip(urls, texts):
            mentions, triples = self.link_text(url, text, want_mentions)
            all_t.extend(triples)
            all_m.extend(mentions)
        return _assemble(all_t, all_m)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cand_tbl, _ = self._tables(batch, want_mentions=False)
        return cand_tbl


class MentionScanner(EntityLinker):
    """Same state, mention-rows output (the F3 intermediate)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, ment_tbl = self._tables(batch)
        return ment_tbl


class LinkScan(EntityLinker):
    """Combined one-pass output: tagged union of candidate-triple rows and
    mention rows (kind column).  One scan instead of two — the hot stage
    runs once; downstream splits with cheap vectorized filters."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cand, ment = self._tables(batch)
        return _tag_union(cand, ment)


class FusedExtractLinkPartial(EntityLinker):
    """Operator fusion for the hot path: extract (when html is present) +
    link + within-batch partial triple dedup, all inside one actor call.

    Keeps the expensive work on the scalable actor pool and leaves only the
    final low-cardinality bucket merge outside it — the key to linear
    scaling of the core extract->link->canonicalize flow (the non-pool CPUs
    otherwise serialize the canonicalization tail)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .extract import extract_batch

        if "html" in batch.column_names:
            batch = extract_batch(batch)
        cand, _ = self._tables(batch, want_mentions=False)
        cand = cand.filter(pa.compute.not_equal(cand["pred"], DEAD_LETTER))
        out = cand.select(["subj", "pred", "obj", "evidence_url"])
        return (
            out.group_by(["subj", "pred", "obj"])
            .aggregate([("evidence_url", "min"), ([], "count_all")])
            .rename_columns(["subj", "pred", "obj", "evidence_url", "n"])
        )


# Default scan strategy for the pool stages.  "token" and "vector" are
# byte-identical (tests/test_linking_vec.py); the choice is a performance
# policy — overridable per call or via LINK_STRATEGY (the --source-parser
# strategy-flag analog, ``input_params.py:37-42``).
import os as _os

DEFAULT_STRATEGY = _os.environ.get("LINK_STRATEGY", "token")


def _resolve_cls(cls, strategy: str):
    if strategy == "vector":
        from . import linking_vec as lv

        return {
            "EntityLinker": lv.VectorLinker,
            "MentionScanner": lv.VectorMentionScanner,
            "LinkScan": lv.VectorLinkScan,
            "FusedExtractLinkPartial": lv.VectorFusedExtractLinkPartial,
        }[cls.__name__]
    if strategy == "ac":
        from . import linking_ac as la

        return {
            "EntityLinker": la.AcLinker,
            "MentionScanner": la.AcMentionScanner,
            "LinkScan": la.AcLinkScan,
            "FusedExtractLinkPartial": la.AcFusedExtractLinkPartial,
        }[cls.__name__]
    return cls


def _pool_stage(cls, extracted, alias_ref, concurrency, batch_size, strategy):
    strategy = strategy or DEFAULT_STRATEGY
    return extracted.select_columns(["url", "text"]).map_batches(
        _resolve_cls(cls, strategy),
        fn_constructor_args=(alias_ref, strategy),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_pool_size(),
    )


def link_stage(
    extracted: ray.data.Dataset,
    alias_ref,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    strategy: str | None = None,
) -> ray.data.Dataset:
    """extracted(url, text) -> candidate triples (actor pool)."""
    return _pool_stage(EntityLinker, extracted, alias_ref, concurrency, batch_size, strategy)


def mention_stage(
    extracted: ray.data.Dataset,
    alias_ref,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    strategy: str | None = None,
) -> ray.data.Dataset:
    return _pool_stage(MentionScanner, extracted, alias_ref, concurrency, batch_size, strategy)


def link_scan_stage(
    extracted: ray.data.Dataset,
    alias_ref,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    strategy: str | None = None,
) -> ray.data.Dataset:
    """One-pass combined stage (preferred in full builds)."""
    return _pool_stage(LinkScan, extracted, alias_ref, concurrency, batch_size, strategy)


def fused_link_partial_stage(
    pages: ray.data.Dataset,
    alias_ref,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    strategy: str | None = None,
) -> ray.data.Dataset:
    """pages(url, html|text) -> per-batch partial triples
    (subj, pred, obj, evidence_url, n) — extract + link + partial dedup
    fused in ONE actor call (dead letters dropped).  Compose with
    ``canonicalize.merge_partial_triples`` for the canonical triple set:
    the exchange then moves pre-aggregated partials, not candidate rows."""
    strategy = strategy or DEFAULT_STRATEGY
    cols = [c for c in ("url", "html", "text") if c in pages.schema().names]
    return pages.select_columns(cols).map_batches(
        _resolve_cls(FusedExtractLinkPartial, strategy),
        fn_constructor_args=(alias_ref, strategy),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_pool_size(),
    )


def split_link_scan(tagged: ray.data.Dataset):
    """tagged -> (candidates, mentions) via vectorized filters."""
    candidates = tagged.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], "triple")).select(
            ["subj", "pred", "obj", "evidence_url"]
        ),
        batch_format="pyarrow",
    )
    mentions = tagged.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], "mention")).select(
            ["url", "entity_id", "surface", "start", "end", "anchored"]
        ),
        batch_format="pyarrow",
    )
    return candidates, mentions
