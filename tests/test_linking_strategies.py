"""Token-scan vs regex-scan strategy equivalence (the two scan strategies
mirror the reference's clang/treesitter parser strategy surface)."""

from __future__ import annotations

from clangd_to_neo4j_ray.sources.fixtures import alias_lookup, generate_pages
from clangd_to_neo4j_ray.stages.linking import EntityLinker


def test_token_and_regex_scans_agree():
    fx = generate_pages(200)
    lut = alias_lookup(fx.entities)
    tok = EntityLinker(lut, strategy="token")
    rex = EntityLinker(lut, strategy="regex")
    for url, text in zip(
        fx.pages["url"].to_pylist(), fx.pages["text"].to_pylist()
    ):
        assert tok.link_text(url, text) == rex.link_text(url, text)


def test_token_scan_edge_punctuation():
    lut = {"Alpha Beta": "e1", "Gamma": "e2"}
    tok = EntityLinker(lut, strategy="token")
    rex = EntityLinker(lut, strategy="regex")
    for text in [
        "Alpha Beta works for Gamma.",
        '"Alpha Beta" works for (Gamma).',
        "It links to Gamma.",
        "Gamma! And Alpha Beta.",
        "AlphaX Beta and Gammas.",  # must NOT match
        "Alpha, Beta and Gamma.",  # internal punct breaks the phrase
        "Alpha. Beta near Gamma.",
        "Alpha; Beta!",
        'Alpha" Beta then "Alpha Beta".',  # broken then intact
    ]:
        assert tok.scan(text, 0) == rex.scan(text, 0), text


def test_multi_token_alias_internal_punctuation_no_false_positive():
    """'New, York' must NOT match alias 'New York' (ADVICE r1: the rstripped
    first-token core is a lookup key only, not a match)."""
    lut = {"New York": "e1"}
    tok = EntityLinker(lut, strategy="token")
    assert tok.scan("New, York is big.", 0) == []
    assert tok.scan("New York is big.", 0) == [(0, 8, "New York")]
    # matched span text must equal the alias exactly
    text = "We saw New York today."
    for s, e, a in tok.scan(text, 0):
        assert text[s:e] == a
