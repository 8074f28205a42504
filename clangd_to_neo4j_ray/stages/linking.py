"""Stages M+L: mention detection and entity linking (stateful actor pool).

The analog of the reference's reference-scan + caller-resolution passes:

- mention detection = RefKind-filtered reference collection
  (``clangd_call_graph_builder.py:163-173``): a compiled alias-alternation
  regex (longest-alternative-first => longest match wins) finds dictionary
  surfaces with 0-indexed [start, end) spans, the ``Location`` analog
  (``clangd_index_yaml_parser.py:30-46``).
- anchored linking = Container-field caller resolution
  (``clangd_call_graph_builder.py:203-227``): the sentence's explicit subject.
- context linking = spatial-containment resolution
  (``clangd_call_graph_builder.py:124-201``): a pronoun subject resolves to
  the nearest preceding anchored subject in the same page — deterministic
  first-match-in-document-order, the parallel-safe replacement for the
  reference's sorted-span linear scan with ``break``.

The linker is a callable CLASS: the alias dictionary and compiled regex are
built once per actor from a broadcast object ref (``ray.put`` once on the
driver), mirroring the reference's per-process ``_worker_impl_instance``
initializer (T1, ``compilation_parser.py:161-187``).  Unresolvable pronoun
sentences are emitted as dead-letter rows (pred='__dead_letter__') instead of
silently dropped — SURVEY §7.5 drop-vs-error policy.
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


def compile_alias_regex(aliases) -> re.Pattern:
    """Single alternation over all surfaces, longest-first so the regex
    engine's leftmost-alternative preference yields longest-match semantics
    (e.g. 'The Entity0001' beats its substring 'Entity0001')."""
    ordered = sorted(aliases, key=len, reverse=True)
    return re.compile(
        r"(?<![A-Za-z0-9])(" + "|".join(re.escape(a) for a in ordered) + r")(?![A-Za-z0-9])"
    )


class EntityLinker:
    """Actor-pool stage: text -> (mentions, candidate triples) per batch.

    ``alias_ref`` is a ``ray.ObjectRef`` to the alias->entity_id dict
    (broadcast side input; no shuffle join for the small side, SURVEY §7.4).
    """

    def __init__(self, alias_ref):
        lut = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        self.lut: dict[str, str] = lut
        self.pattern = compile_alias_regex(lut.keys())
        # pred phrases longest-first for unambiguous middle-text matching
        self.pred_phrases = sorted(PRED_PHRASES, key=len, reverse=True)

    def link_text(self, url: str, text: str):
        """Returns (mention_rows, triple_rows) for one document."""
        mentions = []  # (url, entity_id, surface, start, end, anchored)
        triples = []  # (subj, pred, obj, url, start, end)
        last_subject: str | None = None
        offset = 0
        for sent in _SENTENCE_SPLIT.split(text):
            found = [
                (m.start() + offset, m.end() + offset, m.group(1))
                for m in self.pattern.finditer(sent)
            ]
            anchored_idx = -1
            if len(found) == 2:
                # candidate anchored relation: "<A> <phrase> <B>."
                (s0, e0, a0), (s1, e1, a1) = found
                middle = sent[e0 - offset : s1 - offset].strip()
                pred = PRED_PHRASES.get(middle)
                if pred is not None:
                    subj, obj = self.lut[a0], self.lut[a1]
                    triples.append((subj, pred, obj, url, s0, e1))
                    last_subject = subj
                    anchored_idx = 0
            elif len(found) == 1 and sent.startswith("It "):
                s1, e1, a1 = found[0]
                middle = sent[3 : s1 - offset].strip()
                pred = PRED_PHRASES.get(middle)
                if pred is not None:
                    obj = self.lut[a1]
                    if last_subject is not None:
                        triples.append((last_subject, pred, obj, url, s1, e1))
                    else:
                        # dead-letter: unresolvable context (drop-vs-error)
                        triples.append((None, DEAD_LETTER, obj, url, s1, e1))
            for k, (s, e, a) in enumerate(found):
                mentions.append((url, self.lut[a], a, s, e, k == anchored_idx))
            offset += len(sent) + 1  # +1 for the split space
        return mentions, triples

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        subj, pred, obj, eurl, s_arr, e_arr = [], [], [], [], [], []
        for url, text in zip(urls, texts):
            _mentions, triples = self.link_text(url, text)
            for t in triples:
                subj.append(t[0])
                pred.append(t[1])
                obj.append(t[2])
                eurl.append(t[3])
                s_arr.append(t[4])
                e_arr.append(t[5])
        return pa.table(
            {
                "subj": pa.array(subj, type=pa.string()),
                "pred": pa.array(pred, type=pa.string()),
                "obj": pa.array(obj, type=pa.string()),
                "evidence_url": pa.array(eurl, type=pa.string()),
                "evidence_start": pa.array(s_arr, type=pa.int32()),
                "evidence_end": pa.array(e_arr, type=pa.int32()),
            }
        )


class MentionScanner(EntityLinker):
    """Same state, mention-rows output (the F3 intermediate)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        rows = {k: [] for k in ("url", "entity_id", "surface", "start", "end", "anchored")}
        for url, text in zip(urls, texts):
            mentions, _ = self.link_text(url, text)
            for (u, eid, surf, s, e, anch) in mentions:
                rows["url"].append(u)
                rows["entity_id"].append(eid)
                rows["surface"].append(surf)
                rows["start"].append(s)
                rows["end"].append(e)
                rows["anchored"].append(anch)
        return pa.table(
            {
                "url": pa.array(rows["url"], type=pa.string()),
                "entity_id": pa.array(rows["entity_id"], type=pa.string()),
                "surface": pa.array(rows["surface"], type=pa.string()),
                "start": pa.array(rows["start"], type=pa.int32()),
                "end": pa.array(rows["end"], type=pa.int32()),
                "anchored": pa.array(rows["anchored"], type=pa.bool_()),
            }
        )


def link_stage(
    extracted: ray.data.Dataset,
    alias_ref,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> ray.data.Dataset:
    """extracted(url, text) -> candidate triples (actor pool)."""
    return extracted.select_columns(["url", "text"]).map_batches(
        EntityLinker,
        fn_constructor_args=(alias_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_pool_size(),
    )


def mention_stage(
    extracted: ray.data.Dataset,
    alias_ref,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> ray.data.Dataset:
    return extracted.select_columns(["url", "text"]).map_batches(
        MentionScanner,
        fn_constructor_args=(alias_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_pool_size(),
    )
