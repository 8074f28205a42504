"""Deterministic pages-table fixture generator (FIXTURES.md F1-F4).

Synthesizes the Common-Crawl-style input table from BASELINE.json
``input_hint`` — ``pages(url, warc_ts, html, text, lang)`` — plus the entity
alias dictionary (F2) and the *planted* oracle mention/triple sets (F3/F4).
Everything is seeded; no wall clock, no external data.

The grammar plants two kinds of relation evidence, mirroring the reference's
two caller-resolution paths (SURVEY §2.4):
- **anchored** sentences ``"<alias A> <pred phrase> <alias B>."`` — explicit
  subject, the Container-field path (``clangd_call_graph_builder.py:203-227``);
- **pronoun** sentences ``"It <pred phrase> <alias B>."`` — subject must be
  resolved to the nearest preceding anchored subject in the same page, the
  spatial-containment path (``clangd_call_graph_builder.py:124-201``,
  first-match-in-order semantics).

Domains are Zipf-skewed (FIXTURES.md F1) so head-domain skew is exercised.
All text is ASCII: char offsets == byte offsets.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import pyarrow as pa

from ..functions.hashing import entity_id

SEED = 42
N_ENTITIES = 500
N_DOMAINS = 50
EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z in epoch microseconds

KINDS = ["Person", "Org", "Place", "Work"]
PRED_PHRASES = {
    "works for": "works_for",
    "is located in": "located_in",
    "is affiliated with": "affiliated_with",
    "links to": "links_to",
}
FILLERS = [
    "the quick brown fox jumps over the lazy dog.",
    "a rolling stone gathers no moss today.",
    "many hands make light work around here.",
    "every cloud has a silver lining somewhere.",
]


@dataclass
class EntityRecord:
    entity_id: str
    canonical_name: str
    kind: str
    aliases: list[str] = field(default_factory=list)


N_SHARED = 50  # ambiguous aliases, each shared by two entities
SHARED_BASE = 300  # first entity index used for shared-alias pairs


def make_entities() -> list[EntityRecord]:
    """F2 dictionary: content-hash IDs, 1-3 deterministic alias variants."""
    out = []
    for i in range(N_ENTITIES):
        name = f"Entity{i:04d}"
        kind = KINDS[i % 4]
        aliases = [name, f"E{i:04d}"]
        if kind == "Org":
            aliases.append(f"The {name}")
        out.append(EntityRecord(entity_id(name), name, kind, aliases))
    return out


def shared_aliases(entities: list[EntityRecord]) -> dict[str, list[tuple[str, str]]]:
    """Ambiguous surfaces: ``Corp{i:02d}`` is an alias of BOTH entity 2i and
    entity 2i+1.  Candidates listed in ascending entity_id order — the
    deterministic fallback order for context resolution."""
    out: dict[str, list[tuple[str, str]]] = {}
    for i in range(N_SHARED):
        # tail entities (rarely drawn by the Zipf sampler) so accidental
        # co-mentions of the wrong candidate stay rare
        a, b = entities[SHARED_BASE + 2 * i], entities[SHARED_BASE + 2 * i + 1]
        cands = sorted(
            [(a.entity_id, a.canonical_name), (b.entity_id, b.canonical_name)]
        )
        out[f"Corp{i:02d}"] = cands
    return out


def alias_lookup(entities: list[EntityRecord]):
    """alias surface -> entity_id, or (for ambiguous shared surfaces) a list
    of candidate (entity_id, canonical_name) pairs.

    The ambiguous entries are the context-scored-linking workload: the
    engine must resolve them from page context (a candidate mentioned
    unambiguously elsewhere on the page wins; else min entity_id)."""
    lut: dict = {}
    for e in entities:
        for a in e.aliases:
            lut[a] = e.entity_id
    lut.update(shared_aliases(entities))
    return lut


@dataclass
class PagesFixture:
    pages: pa.Table
    entities: list[EntityRecord]
    oracle_mentions: pa.Table  # (url, entity_id, surface, start, end, anchored)
    oracle_triples: set[tuple[str, str, str]]
    oracle_triple_evidence: dict[tuple[str, str, str], str]  # min-url witness


def generate_pages(
    n_pages: int,
    seed: int = SEED,
    start: int = 0,
    sent_range: tuple[int, int] = (2, 6),
) -> PagesFixture:
    """Generate ``n_pages`` rows; ``start`` offsets page indices (urls and
    timestamps) so sharded generation produces disjoint pages.  ``sent_range``
    controls sentences per page (the bench scale corpus uses denser pages,
    closer to real web-page text volume)."""
    rng = random.Random(seed)
    entities = make_entities()
    # Zipf-ish popularity over entities and domains.
    ent_weights = [1.0 / (i + 1) for i in range(N_ENTITIES)]
    dom_weights = [1.0 / (j + 1) for j in range(N_DOMAINS)]
    pred_list = list(PRED_PHRASES.items())

    urls, tss, htmls, texts, langs = [], [], [], [], []
    m_url, m_eid, m_surface, m_start, m_end, m_anch = [], [], [], [], [], []
    triples: set[tuple[str, str, str]] = set()
    evidence: dict[tuple[str, str, str], str] = {}

    shared_map = shared_aliases(entities)

    for i in range(start, start + n_pages):
        dom = rng.choices(range(N_DOMAINS), weights=dom_weights)[0]
        url = f"https://d{dom:02d}.example.com/p{i:06d}"
        lang = "en" if rng.random() < 0.95 else rng.choice(["de", "fr"])
        sentences: list[str] = []
        # [surface, eid_or_None, anchored, candidate_ids_or_None]
        page_mentions: list[list] = []
        page_triples: list[list] = []
        patches: list[tuple[int, int]] = []  # (triple idx, mention idx)
        last_subject: str | None = None

        n_sent = rng.randint(*sent_range)
        for _s in range(n_sent):
            r = rng.random()
            if r < 0.25:
                sentences.append(rng.choice(FILLERS))
                continue
            if r < 0.45 and last_subject is not None:
                # pronoun sentence: subject = nearest preceding anchored subject
                phrase, pred = rng.choice(pred_list)
                eb = entities[rng.choices(range(N_ENTITIES), weights=ent_weights)[0]]
                sb = rng.choice(eb.aliases)
                sentences.append(f"It {phrase} {sb}.")
                page_mentions.append([sb, eb.entity_id, False, None])
                page_triples.append([last_subject, pred, eb.entity_id])
                continue
            # anchored sentence
            phrase, pred = rng.choice(pred_list)
            ea = entities[rng.choices(range(N_ENTITIES), weights=ent_weights)[0]]
            sa = rng.choice(ea.aliases)
            if rng.random() < 0.2:
                # ambiguous object: a shared alias, disambiguated by a
                # preceding unambiguous mention of the intended entity
                # (the context-scored-linking workload).  The final label is
                # assigned at page end by the resolution rule itself, so the
                # planted truth is exactly rule-consistent.
                j = rng.randrange(N_SHARED)
                intended = SHARED_BASE + 2 * j + rng.randrange(2)
                eb = entities[intended]
                sb = f"Corp{j:02d}"
                sentences.append(f"{eb.canonical_name} appears in this report.")
                page_mentions.append([eb.canonical_name, eb.entity_id, False, None])
                sentences.append(f"{sa} {phrase} {sb}.")
                page_mentions.append([sa, ea.entity_id, True, None])
                cands = [c[0] for c in shared_map[sb]]
                page_mentions.append([sb, None, False, cands])
                page_triples.append([ea.entity_id, pred, None])
                patches.append((len(page_triples) - 1, len(page_mentions) - 1))
            else:
                eb = entities[rng.choices(range(N_ENTITIES), weights=ent_weights)[0]]
                sb = rng.choice(eb.aliases)
                sentences.append(f"{sa} {phrase} {sb}.")
                page_mentions.append([sa, ea.entity_id, True, None])
                page_mentions.append([sb, eb.entity_id, False, None])
                page_triples.append([ea.entity_id, pred, eb.entity_id])
            last_subject = ea.entity_id

        # page-end resolution of ambiguous mentions (the engine's rule)
        unamb = {m[1] for m in page_mentions if m[3] is None}
        for m in page_mentions:
            if m[3] is not None:
                m[1] = next((c for c in m[3] if c in unamb), m[3][0])
        for ti, mi in patches:
            page_triples[ti][2] = page_mentions[mi][1]

        text = " ".join(sentences)
        # html wraps each sentence in <p>; some rows add boilerplate that
        # extraction must drop (FIXTURES.md F1).
        parts = ["<html><body>"]
        if rng.random() < 0.3:
            parts.append("<nav>home | about | contact</nav>")
        parts.extend(f"<p>{s}</p>" for s in sentences)
        if rng.random() < 0.3:
            parts.append("<script>var x = 1;</script>")
        parts.append("</body></html>")
        html = "".join(parts).encode("utf-8")

        urls.append(url)
        tss.append(EPOCH_US + i * 1_000_000)  # i includes the shard offset
        htmls.append(html)
        texts.append(text)
        langs.append(lang)

        # oracle mention spans: locate each planted surface occurrence in order
        cursor = 0
        for surface, eid, anch, _cands in page_mentions:
            m_s = text.index(surface, cursor)
            m_url.append(url)
            m_eid.append(eid)
            m_surface.append(surface)
            m_start.append(m_s)
            m_end.append(m_s + len(surface))
            m_anch.append(anch)
            cursor = m_s + len(surface)
        for tl in page_triples:
            t = tuple(tl)
            triples.add(t)
            if t not in evidence or url < evidence[t]:
                evidence[t] = url

    pages = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
    mentions = pa.table(
        {
            "url": pa.array(m_url, type=pa.string()),
            "entity_id": pa.array(m_eid, type=pa.string()),
            "surface": pa.array(m_surface, type=pa.string()),
            "start": pa.array(m_start, type=pa.int32()),
            "end": pa.array(m_end, type=pa.int32()),
            "anchored": pa.array(m_anch, type=pa.bool_()),
        }
    )
    return PagesFixture(pages, entities, mentions, triples, evidence)


def generate_pages_sharded(
    n_pages: int,
    out_dir: str,
    *,
    num_shards: int = 32,
    seed: int = SEED,
    sent_range: tuple[int, int] = (2, 6),
) -> str:
    """Parallel corpus generation: one Ray task per shard, each seeded with
    (seed, shard) and offset by the shard start index — deterministic and
    disjoint.  For bench-scale corpora (tests use the sequential
    generate_pages whose oracle sets are also returned)."""
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)
    per = (n_pages + num_shards - 1) // num_shards

    @ray.remote
    def gen_shard(shard: int) -> str:
        import pyarrow.parquet as pq

        n = min(per, n_pages - shard * per)
        if n <= 0:
            return ""
        fx = generate_pages(n, seed=seed * 1000 + shard, start=shard * per, sent_range=sent_range)
        path = os.path.join(out_dir, f"part-{shard:05d}.parquet")
        pq.write_table(fx.pages, path)
        return path

    ray.get([gen_shard.remote(s) for s in range(num_shards)])
    return out_dir


def write_pages_fixture(
    fixture: PagesFixture, out_dir: str, num_files: int = 8
) -> list[str]:
    """Write the pages table as >=num_files Parquet files (partition layout
    for checkpoint/resume and scaling tests, FIXTURES.md F1)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n = fixture.pages.num_rows
    per = max(1, (n + num_files - 1) // num_files)
    paths = []
    for k in range(0, n, per):
        path = os.path.join(out_dir, f"part-{k // per:05d}.parquet")
        pq.write_table(fixture.pages.slice(k, per), path)
        paths.append(path)
    return paths
