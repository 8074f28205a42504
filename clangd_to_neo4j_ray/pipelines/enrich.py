"""Enrichment pipeline — the RAG-pass analog (Passes 7 / summaries+embeddings).

Re-expresses ``code_graph_rag_generator.py`` over the web graph:

- per-page summaries (codeSummary analog, bottom of the hierarchy);
- domain rollups (A5 file-summary + A6 folder-rollup: children summaries
  grouped and re-summarized level by level, deepest first);
- one project summary (A7 global reduce);
- deterministic embeddings on every summary (the embedding pass,
  ``code_graph_rag_generator.py:447-490``).

Model state is the T3/T4 analog: the summarizer/embedder "client" is built
once per actor in ``__init__`` (``llm_client.py:22-148``); the default
client is deterministic and offline, exactly like the reference's
``FakeLlmClient`` default (``llm_client.py:93-99``, ``input_params.py:43-44``)
so the whole pipeline is reproducible without network access.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..context import default_pool_size
from ..stages.hierarchy import domain_of

EMBED_DIM = 64


class FakeLlmClient:
    """Deterministic offline summarizer (FakeLlmClient analog)."""

    def summarize(self, name: str, children: list[str] | None, text: str | None) -> str:
        if children is not None:
            h = hashlib.md5("\n".join(sorted(children)).encode()).hexdigest()[:8]
            return f"summary[{name}]: {len(children)} children ({h})"
        h = hashlib.md5((text or "").encode()).hexdigest()[:8]
        return f"summary[{name}]: {len(text or '')} chars ({h})"


class DeterministicEmbedder:
    """Deterministic pseudo-embedding client (all-MiniLM stand-in, T3 analog).

    md5-seeded unit vectors, EMBED_DIM dims — batch ``encode`` like the
    reference's EmbeddingClient (``llm_client.py:128-148``)."""

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), EMBED_DIM), dtype=np.float64)
        for i, t in enumerate(texts):
            buf = b"".join(
                hashlib.md5(f"{k}|{t}".encode()).digest() for k in range(EMBED_DIM // 4)
            )
            v = np.frombuffer(buf, dtype=np.uint32)[:EMBED_DIM].astype(np.float64)
            v = v / np.iinfo(np.uint32).max - 0.5
            out[i] = v / np.linalg.norm(v)
        return out


class PageSummarizer:
    """Actor-pool stage: page text -> summary + embedding."""

    def __init__(self):
        self.llm = FakeLlmClient()
        self.embedder = DeterministicEmbedder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        summaries = [self.llm.summarize(u, None, t) for u, t in zip(urls, texts)]
        emb = self.embedder.encode(summaries)
        return pa.table(
            {
                "url": batch["url"],
                "domain": pa.array([domain_of(u) for u in urls], type=pa.string()),
                "summary": pa.array(summaries, type=pa.string()),
                "embedding": pa.array(list(emb), type=pa.list_(pa.float64())),
            }
        )


def enrich_pages(extracted: ray.data.Dataset) -> ray.data.Dataset:
    """extracted(url, text) -> (url, domain, summary, embedding)."""
    return extracted.select_columns(["url", "text"]).map_batches(
        PageSummarizer,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=default_pool_size(),
    )


def rollup_domains(page_summaries: ray.data.Dataset) -> ray.data.Dataset:
    """A6 analog: per-domain rollup of child page summaries (one level of the
    depth-descending hierarchy; children collected per group, order-
    independent because the fake client sorts them)."""
    llm = FakeLlmClient()
    embedder = DeterministicEmbedder()

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        domain = g["domain"].iloc[0]
        s = llm.summarize(domain, g["summary"].tolist(), None)
        emb = embedder.encode([s])[0]
        return pd.DataFrame(
            {
                "domain": [domain],
                "n_pages": pd.Series([len(g)], dtype="int64"),
                "summary": [s],
                "embedding": [list(emb)],
            }
        )

    return page_summaries.groupby("domain").map_groups(roll, batch_format="pandas")


def project_summary(domain_summaries: ray.data.Dataset) -> dict:
    """A7 global reduce: all domain summaries -> one project record."""
    rows = domain_summaries.select_columns(["domain", "summary"]).take_all()
    llm = FakeLlmClient()
    s = llm.summarize("project:root", [r["summary"] for r in rows], None)
    emb = DeterministicEmbedder().encode([s])[0]
    return {"node_id": "project:root", "summary": s, "embedding": list(emb)}


def enrich_documents(sf_dir: str) -> ray.data.Dataset:
    """Driver-facing enrichment over the documents table.

    Output: (doc_id, summary, emb_norm_int) — deterministic, and fully
    oracle-checked: the fake summarizer is md5-based so the summary string
    is DuckDB-expressible (ORACLE_SQL below), and the embedder normalizes,
    so emb_norm_int == 1000 is a checked invariant."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    class DocSummarizer:
        def __init__(self):
            self.llm = FakeLlmClient()
            self.embedder = DeterministicEmbedder()

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            texts = batch["text"].to_pylist()
            summaries = [
                self.llm.summarize(f"doc:{i}", None, t) for i, t in zip(ids, texts)
            ]
            emb = self.embedder.encode(summaries)
            norms = np.rint(np.linalg.norm(emb, axis=1) * 1000).astype(np.int64)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "summary": pa.array(summaries, type=pa.string()),
                    "emb_norm_int": pa.array(norms),
                }
            )

    return ds.map_batches(
        DocSummarizer,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=default_pool_size(),
    )


# The md5-based fake client makes the model stage SQL-checkable (closes the
# round-1 no_oracle row for enrich_documents).
ORACLE_SQL: dict[str, str] = {
    "enrich_documents": """
SELECT doc_id,
       'summary[doc:' || doc_id || ']: ' || length(text) || ' chars ('
         || substr(md5(text), 1, 8) || ')' AS summary,
       CAST(1000 AS BIGINT) AS emb_norm_int
FROM documents
""",
}
