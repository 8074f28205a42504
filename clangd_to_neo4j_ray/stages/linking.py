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

Two scan strategies (the ``--source-parser {clang,treesitter}`` strategy
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

    def link_text(self, url: str, text: str):
        """Returns (mention_rows, triple_rows) for one document."""
        sentence_founds = []
        offset = 0
        for sent in _SENTENCE_SPLIT.split(text):
            sentence_founds.append((offset, self.scan(sent, offset)))
            offset += len(sent) + 1  # +1 for the split space
        return self.doc_relations(url, text, sentence_founds)

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

    def doc_relations(self, url: str, text: str, sentence_founds):
        """Shared relation logic given per-sentence mention spans.

        ``sentence_founds``: [(sent_start_char, [(start, end, alias), ...])]
        in document order.  Spans are absolute char offsets into ``text``.
        Sentences without mentions may be omitted (they affect nothing)."""
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
            for k, (s, e, a) in enumerate(found):
                mentions.append(
                    (url, self.resolve(a, doc_eids), a, s, e, k == anchored_idx)
                )
        return mentions, triples

    def _tables(self, batch: pa.Table):
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        m_rows = {k: [] for k in ("url", "entity_id", "surface", "start", "end", "anchored")}
        subj, pred, obj, eurl, s_arr, e_arr = [], [], [], [], [], []
        for url, text in zip(urls, texts):
            mentions, triples = self.link_text(url, text)
            for t in triples:
                subj.append(t[0])
                pred.append(t[1])
                obj.append(t[2])
                eurl.append(t[3])
                s_arr.append(t[4])
                e_arr.append(t[5])
            for (u, eid, surf, s, e, anch) in mentions:
                m_rows["url"].append(u)
                m_rows["entity_id"].append(eid)
                m_rows["surface"].append(surf)
                m_rows["start"].append(s)
                m_rows["end"].append(e)
                m_rows["anchored"].append(anch)
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
        ment_tbl = pa.table(
            {
                "url": pa.array(m_rows["url"], type=pa.string()),
                "entity_id": pa.array(m_rows["entity_id"], type=pa.string()),
                "surface": pa.array(m_rows["surface"], type=pa.string()),
                "start": pa.array(m_rows["start"], type=pa.int32()),
                "end": pa.array(m_rows["end"], type=pa.int32()),
                "anchored": pa.array(m_rows["anchored"], type=pa.bool_()),
            }
        )
        return cand_tbl, ment_tbl

    def __call__(self, batch: pa.Table) -> pa.Table:
        cand_tbl, _ = self._tables(batch)
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
        n_c, n_m = len(cand), len(ment)

        def pad(col, before: int, after: int, typ):
            return pa.array(
                [None] * before + col.to_pylist() + [None] * after, type=typ
            )

        return pa.table(
            {
                "kind": pa.array(
                    ["triple"] * n_c + ["mention"] * n_m, type=pa.string()
                ),
                "subj": pad(cand["subj"], 0, n_m, pa.string()),
                "pred": pad(cand["pred"], 0, n_m, pa.string()),
                "obj": pad(cand["obj"], 0, n_m, pa.string()),
                "evidence_url": pad(cand["evidence_url"], 0, n_m, pa.string()),
                "url": pad(ment["url"], n_c, 0, pa.string()),
                "entity_id": pad(ment["entity_id"], n_c, 0, pa.string()),
                "surface": pad(ment["surface"], n_c, 0, pa.string()),
                "start": pad(ment["start"], n_c, 0, pa.int32()),
                "end": pad(ment["end"], n_c, 0, pa.int32()),
                "anchored": pad(ment["anchored"], n_c, 0, pa.bool_()),
            }
        )


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
        cand, _ = self._tables(batch)
        out = cand.select(["subj", "pred", "obj", "evidence_url"])
        return (
            out.group_by(["subj", "pred", "obj"])
            .aggregate([("evidence_url", "min"), ([], "count_all")])
            .rename_columns(["subj", "pred", "obj", "evidence_url", "n"])
        )


def _pool_stage(cls, extracted, alias_ref, concurrency, batch_size, strategy):
    return extracted.select_columns(["url", "text"]).map_batches(
        cls,
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
    strategy: str = "token",
) -> ray.data.Dataset:
    """extracted(url, text) -> candidate triples (actor pool)."""
    return _pool_stage(EntityLinker, extracted, alias_ref, concurrency, batch_size, strategy)


def mention_stage(
    extracted: ray.data.Dataset,
    alias_ref,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    strategy: str = "token",
) -> ray.data.Dataset:
    return _pool_stage(MentionScanner, extracted, alias_ref, concurrency, batch_size, strategy)


def link_scan_stage(
    extracted: ray.data.Dataset,
    alias_ref,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    strategy: str = "token",
) -> ray.data.Dataset:
    """One-pass combined stage (preferred in full builds)."""
    return _pool_stage(LinkScan, extracted, alias_ref, concurrency, batch_size, strategy)


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
