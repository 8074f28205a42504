"""AC-scanner equivalence: the Aho-Corasick strategy must reproduce the
reference regex semantics exactly — including punctuation the token
scanner's whole-token assumption does not cover ('Alpha-Beta')."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from clangd_to_neo4j_ray.sources.fixtures import (
    alias_lookup, generate_pages, make_entities)
from clangd_to_neo4j_ray.stages.linking import (
    _SENTENCE_SPLIT, EntityLinker, FusedExtractLinkPartial)
from clangd_to_neo4j_ray.stages.linking_ac import (
    AcFusedExtractLinkPartial, AcLinker)

LUT = {
    "Alpha": "e1", "Alpha Beta": "e2", "Gamma": "e3", "The Alpha": "e4",
    # alias containing '. ': can NEVER match under the per-sentence regex
    # semantics (the sentence split removes the separator space) — guards
    # the AC scanner's cross-sentence-hit rejection
    "St. Louis": "e5",
}

WORDS = st.sampled_from(
    ["Alpha", "Beta", "Alpha Beta", "Gamma", "it", "works", "for", "x9",
     "The Alpha", "Alpha,", "Alpha-Beta", "(Gamma)", "Alphabet", "Betas",
     "Alpha.Beta", "The", "St. Louis", "St.", "Louis"]
)


@given(tokens=st.lists(WORDS, min_size=1, max_size=25))
@settings(max_examples=60, deadline=None)
def test_ac_scan_equals_regex_scan(tokens):
    text = " ".join(tokens) + "."
    rex = EntityLinker(LUT, strategy="regex")
    ac = AcLinker(LUT, strategy="ac")
    exp = []
    offset = 0
    for sent in _SENTENCE_SPLIT.split(text):
        f = rex.scan(sent, offset)
        if f:
            exp.append((offset, f))
        offset += len(sent) + 1
    got = ac._scan_texts([text])[0]
    assert got == exp, text


def test_ac_non_ascii_fallback():
    """Non-ASCII docs must fall back to the char-exact regex scan (AC byte
    offsets would drift from char offsets)."""
    ac = AcLinker(LUT, strategy="ac")
    text = "café nonsense Alpha works for Gamma."
    (ss, found), = [x for x in ac._scan_texts([text])[0] if x[1]]
    assert [(s, e, a) for s, e, a in found] == [
        (text.index("Alpha"), text.index("Alpha") + 5, "Alpha"),
        (text.index("Gamma"), text.index("Gamma") + 5, "Gamma"),
    ]


def test_ac_fused_matches_token_fused():
    """Whole-batch parity on the planted fixture corpus."""
    lut = alias_lookup(make_entities())
    fx = generate_pages(300, sent_range=(4, 10))
    batch = pa.table({"url": fx.pages["url"], "text": fx.pages["text"]})
    keys = [("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")]
    rt = FusedExtractLinkPartial(lut, "token")(batch).sort_by(keys)
    ra = AcFusedExtractLinkPartial(lut, "ac")(batch).sort_by(keys)
    assert rt.equals(ra)


def test_ac_link_scan_matches_token_link_scan():
    """Mention-path parity (spans, anchored flags, tagged union) on the
    fixture corpus — covers the want_mentions=True side of the AC scanner."""
    from clangd_to_neo4j_ray.stages.linking import LinkScan
    from clangd_to_neo4j_ray.stages.linking_ac import AcLinkScan

    lut = alias_lookup(make_entities())
    fx = generate_pages(200, sent_range=(4, 10))
    batch = pa.table({"url": fx.pages["url"], "text": fx.pages["text"]})
    keys = [(c, "ascending") for c in
            ("kind", "url", "start", "end", "subj", "pred", "obj",
             "evidence_url", "entity_id", "surface")]
    rt = LinkScan(lut, "token")(batch).sort_by(keys)
    ra = AcLinkScan(lut, "ac")(batch).sort_by(keys)
    assert rt.equals(ra)
