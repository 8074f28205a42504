"""Single-process reference extractor/linker — the P/R oracle.

A deliberately simple (~100 line) sequential implementation of the same
extraction + linking + canonicalization semantics as the distributed
pipeline, used by pytest to compute triple-set precision/recall (gate >=0.95,
BASELINE.json north_rule).  This plays the role the reference's own extractor
semantics play for the P/R comparison (SURVEY §5): an independently-written,
trivially-auditable implementation over the same fixture.

It shares only the *spec* with the engine (sentence grammar, longest-match
alias rule, nearest-preceding-anchor pronoun resolution, min-url dedup), not
the code paths: a separate regex scan and a plain dict-based dedup.
"""

from __future__ import annotations

import re

from .sources.fixtures import EntityRecord
from .stages.extract import extract_text_from_html

PRED_PHRASES = {
    "works for": "works_for",
    "is located in": "located_in",
    "is affiliated with": "affiliated_with",
    "links to": "links_to",
}


def oracle_triples(
    pages: list[dict], entities: list[EntityRecord]
) -> dict[tuple[str, str, str], str]:
    """pages rows (url, html) -> {(subj, pred, obj): min_evidence_url}."""
    from .sources.fixtures import shared_aliases

    lut: dict = {a: e.entity_id for e in entities for a in e.aliases}
    lut.update(shared_aliases(entities))
    pattern = re.compile(
        r"(?<![A-Za-z0-9])("
        + "|".join(re.escape(a) for a in sorted(lut, key=len, reverse=True))
        + r")(?![A-Za-z0-9])"
    )

    def resolve(alias: str, doc_eids: set[str]) -> str:
        v = lut[alias]
        if isinstance(v, str):
            return v
        for eid, _canonical in v:
            if eid in doc_eids:
                return eid
        return v[0][0]

    out: dict[tuple[str, str, str], str] = {}
    for row in pages:
        url = row["url"]
        text = extract_text_from_html(row["html"])
        # page context: unambiguous mentions anywhere on the page
        doc_eids = {
            lut[m.group(1)]
            for m in pattern.finditer(text)
            if isinstance(lut[m.group(1)], str)
        }
        last_subject = None
        for sent in text.split(". "):
            if not sent.endswith("."):
                sent = sent + "."
            ms = list(pattern.finditer(sent))
            triple = None
            if len(ms) == 2:
                middle = sent[ms[0].end() : ms[1].start()].strip()
                if middle in PRED_PHRASES:
                    subj = resolve(ms[0].group(1), doc_eids)
                    triple = (
                        subj,
                        PRED_PHRASES[middle],
                        resolve(ms[1].group(1), doc_eids),
                    )
                    last_subject = subj
            elif len(ms) == 1 and sent.startswith("It "):
                middle = sent[3 : ms[0].start()].strip()
                if middle in PRED_PHRASES and last_subject is not None:
                    triple = (
                        last_subject,
                        PRED_PHRASES[middle],
                        resolve(ms[0].group(1), doc_eids),
                    )
            if triple is not None:
                if triple not in out or url < out[triple]:
                    out[triple] = url
    return out


def precision_recall(
    got: set[tuple[str, str, str]], expected: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not got:
        return (1.0 if not expected else 0.0), (1.0 if not expected else 0.0)
    tp = len(got & expected)
    return tp / len(got), tp / len(expected) if expected else 1.0
