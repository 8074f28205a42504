"""Vectorized scanner equivalence: VectorLinker must produce byte-identical
outputs to the per-token Python scanner on the planted fixture and on
adversarial random token sequences."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from clangd_to_neo4j_ray.sources.fixtures import alias_lookup, generate_pages
from clangd_to_neo4j_ray.stages.linking import LinkScan
from clangd_to_neo4j_ray.stages.linking_vec import VectorLinker, VectorLinkScan


def _batch(urls, texts):
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def test_vector_matches_token_on_fixture():
    fx = generate_pages(300)
    lut = alias_lookup(fx.entities)
    vec = VectorLinker(lut)
    ref = LinkScan(lut)
    batch = _batch(fx.pages["url"].to_pylist(), fx.pages["text"].to_pylist())
    vc, vm = vec._tables(batch)
    rc, rm = ref._tables(batch)
    assert vc.equals(rc), "candidate tables differ"
    assert vm.equals(rm), "mention tables differ"


def test_vector_linkscan_tagged_output():
    fx = generate_pages(50)
    lut = alias_lookup(fx.entities)
    batch = _batch(fx.pages["url"].to_pylist(), fx.pages["text"].to_pylist())
    tagged_vec = VectorLinkScan(lut)(batch)
    tagged_ref = LinkScan(lut)(batch)
    assert tagged_vec.equals(tagged_ref)


WORDS = st.sampled_from(
    [
        "Alpha", "Beta", "Alpha Beta", "Gamma", "The Alpha", "it", "It",
        "works", "for.", "x.", "links", "to", "(Gamma)", '"Alpha"',
        "Alpha.", "The", "works for", "Alpha,", "Alpha;", "The,", '"Alpha',
    ]
)


def test_vector_no_internal_punct_false_positive():
    """'New, York' must not match 'New York' in the vectorized path either
    (ADVICE r1: both scanners used the both-trimmed first-token key)."""
    lut = {"New York": "e1", "York": "e2"}
    batch = _batch(
        ["u1", "u2"], ["New, York is big.", "New York is big."]
    )
    vc, vm = VectorLinker(lut)._tables(batch)
    rc, rm = LinkScan(lut)._tables(batch)
    assert vm.to_pydict() == rm.to_pydict()
    # u1 matches only the single-token 'York'; u2 matches 'New York'
    surf_by_url = list(zip(vm["url"].to_pylist(), vm["surface"].to_pylist()))
    assert surf_by_url == [("u1", "York"), ("u2", "New York")]


@given(
    docs=st.lists(
        st.lists(WORDS, min_size=1, max_size=25), min_size=1, max_size=6
    )
)
@settings(max_examples=60, deadline=None)
def test_vector_matches_token_property(docs):
    lut = {
        "Alpha": "e1",
        "Alpha Beta": "e2",
        "Gamma": "e3",
        "The Alpha": "e4",
        "works": "e5",
    }
    urls = [f"u{i}" for i in range(len(docs))]
    texts = [" ".join(toks) for toks in docs]
    batch = _batch(urls, texts)
    vc, vm = VectorLinker(lut)._tables(batch)
    rc, rm = LinkScan(lut)._tables(batch)
    assert vm.to_pydict() == rm.to_pydict(), (texts, vm.to_pydict(), rm.to_pydict())
    assert vc.to_pydict() == rc.to_pydict()
