"""Context-scored disambiguation unit tests (ambiguous shared aliases)."""

from __future__ import annotations

from clangd_to_neo4j_ray.stages.linking import EntityLinker


def _lut():
    return {
        "EntityA": "id_a",
        "EntityB": "id_b",
        "EntityC": "id_c",
        "Corp": [("id_a", "EntityA"), ("id_b", "EntityB")],
    }


def test_ambiguous_resolved_by_page_context():
    linker = EntityLinker(_lut())
    # EntityB mentioned unambiguously -> Corp resolves to id_b
    text = "EntityB appears in this report. EntityC works for Corp."
    mentions, triples = linker.link_text("u", text)
    assert triples == [("id_c", "works_for", "id_b", "u", 32, 54)]
    assert [m[1] for m in mentions] == ["id_b", "id_c", "id_b"]


def test_ambiguous_fallback_min_id():
    linker = EntityLinker(_lut())
    # no candidate context -> deterministic min entity_id
    mentions, triples = linker.link_text("u", "EntityC works for Corp.")
    assert triples[0][2] == "id_a"


def test_context_prefers_min_id_when_both_present():
    linker = EntityLinker(_lut())
    text = (
        "EntityB appears in this report. EntityA appears in this report. "
        "EntityC works for Corp."
    )
    _m, triples = linker.link_text("u", text)
    assert triples[0][2] == "id_a"  # both present -> ascending-id order wins
