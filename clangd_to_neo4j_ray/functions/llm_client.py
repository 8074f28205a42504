"""LLM / embedding client factory — the T4 extension surface.

Mirrors the reference's client stack (``llm_client.py:14-114`` ABCs +
env-configured API clients + ``FakeLlmClient`` default, factory at
``llm_client.py:102-114``; embedding side ``:120-156``) for the web-graph
enrichment pipeline:

- ``FakeLlmClient`` / ``DeterministicEmbedder``: offline, md5-deterministic
  — the DEFAULT, exactly like the reference (``input_params.py:43-44``), so
  every enrichment query stays oracle-checkable without network access.
- ``OpenAiCompatibleClient``: env-configured real path
  (``GRAFT_LLM_API_KEY`` required, ``GRAFT_LLM_API_URL`` /
  ``GRAFT_LLM_MODEL`` optional) speaking the OpenAI chat-completions wire
  format over stdlib urllib; constructing it without a key fails loudly,
  like the reference's ``OpenAiClient.__init__`` (``llm_client.py:24-28``).
- ``SentenceTransformerClient``: local model behind an import-try
  (``llm_client.py:128-148``); raises ImportError with install guidance
  when the package is absent (it is not in this container).

Concurrency: remote API clients are I/O-bound, so stages size their actor
pool from ``remote_concurrency()`` (``GRAFT_NUM_REMOTE_WORKERS``, default
100 — the reference's ``--num-remote-workers`` default,
``input_params.py:27-28``); local clients use the CPU-bound pool size.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

EMBED_DIM = 64

DEFAULT_LLM_API = "fake"
DEFAULT_EMBED_API = "fake"


class LlmClient:
    """Base summarizer client (``llm_client.py:14-20`` analog)."""

    is_local: bool = False

    def summarize(
        self, name: str, children: list[str] | None, text: str | None
    ) -> str:
        raise NotImplementedError


class EmbeddingClient:
    """Base embedding client (``llm_client.py:120-126`` analog)."""

    is_local: bool = False

    def encode(self, texts: list[str]) -> np.ndarray:
        raise NotImplementedError


class FakeLlmClient(LlmClient):
    """Deterministic offline summarizer (``llm_client.py:93-99`` analog) —
    md5-based so the summary string is SQL-expressible (the enrichment
    oracle depends on this exact format).  Marked local (pure CPU) so the
    stage sizes a CPU-bound pool — the reference marks its fake as remote
    to exercise the thread pool, which a Ray actor pool has no need for."""

    is_local = True

    def summarize(
        self, name: str, children: list[str] | None, text: str | None
    ) -> str:
        if children is not None:
            h = hashlib.md5("\n".join(sorted(children)).encode()).hexdigest()[:8]
            return f"summary[{name}]: {len(children)} children ({h})"
        h = hashlib.md5((text or "").encode()).hexdigest()[:8]
        return f"summary[{name}]: {len(text or '')} chars ({h})"


class DeterministicEmbedder(EmbeddingClient):
    """Deterministic pseudo-embedding client (all-MiniLM stand-in, T3
    analog): md5-seeded unit vectors, EMBED_DIM dims — batch ``encode``
    like the reference's EmbeddingClient (``llm_client.py:128-148``)."""

    is_local = True

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), EMBED_DIM), dtype=np.float64)
        for i, t in enumerate(texts):
            buf = b"".join(
                hashlib.md5(f"{k}|{t}".encode()).digest()
                for k in range(EMBED_DIM // 4)
            )
            v = np.frombuffer(buf, dtype=np.uint32)[:EMBED_DIM].astype(np.float64)
            v = v / np.iinfo(np.uint32).max - 0.5
            out[i] = v / np.linalg.norm(v)
        return out


class OpenAiCompatibleClient(LlmClient):
    """Real remote path: any OpenAI-chat-compatible endpoint, configured
    entirely from env vars (``llm_client.py:22-36`` analog).  Errors are
    raised, not swallowed — the engine's drop-vs-error policy wants failed
    enrichments visible as dead letters, not silent empty strings."""

    def __init__(self):
        self.api_key = os.environ.get("GRAFT_LLM_API_KEY")
        if not self.api_key:
            raise ValueError(
                "GRAFT_LLM_API_KEY environment variable not set (the "
                "OpenAI-compatible client has no offline mode; use the "
                "default 'fake' client for deterministic offline runs)"
            )
        self.api_url = os.environ.get(
            "GRAFT_LLM_API_URL", "https://api.openai.com/v1/chat/completions"
        )
        self.model = os.environ.get("GRAFT_LLM_MODEL", "gpt-4o-mini")
        self.timeout = float(os.environ.get("GRAFT_LLM_TIMEOUT", "120"))

    def _prompt(
        self, name: str, children: list[str] | None, text: str | None
    ) -> str:
        # M16 prompt-builder analog (code_graph_rag_generator.py:299-323)
        if children is not None:
            joined = "\n- ".join(sorted(children))
            return (
                f"Summarize the collection '{name}' from its member "
                f"summaries:\n- {joined}\nOne concise paragraph."
            )
        return (
            f"Summarize the document '{name}' in one concise paragraph:\n"
            f"{text or ''}"
        )

    def summarize(
        self, name: str, children: list[str] | None, text: str | None
    ) -> str:
        import json
        import urllib.request

        payload = {
            "model": self.model,
            "messages": [
                {"role": "user", "content": self._prompt(name, children, text)}
            ],
        }
        req = urllib.request.Request(
            self.api_url,
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        return body["choices"][0]["message"]["content"]


class SentenceTransformerClient(EmbeddingClient):
    """Local sentence-transformers model (``llm_client.py:128-148``
    analog); model loaded once per actor in the stage's ``__init__``."""

    is_local = True

    def __init__(self):
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:
            raise ImportError(
                "the 'sentence-transformers' package is required for local "
                "embeddings (pip install sentence-transformers); use the "
                "default 'fake' embedder for deterministic offline runs"
            ) from e
        model_name = os.environ.get(
            "SENTENCE_TRANSFORMER_MODEL", "all-MiniLM-L6-v2"
        )
        self.model = SentenceTransformer(model_name)

    def encode(self, texts: list[str]) -> np.ndarray:
        return np.asarray(self.model.encode(texts))


_LLM_CLIENTS: dict[str, type[LlmClient]] = {
    "fake": FakeLlmClient,
    "openai": OpenAiCompatibleClient,
    "openai-compatible": OpenAiCompatibleClient,
}
_EMBED_CLIENTS: dict[str, type[EmbeddingClient]] = {
    "fake": DeterministicEmbedder,
    "sentence-transformer": SentenceTransformerClient,
}


def _resolve(api_name: str | None, env_var: str, default: str) -> str:
    return (api_name or os.environ.get(env_var, default)).lower()


def get_llm_client(api_name: str | None = None) -> LlmClient:
    """Factory (``llm_client.py:102-114`` analog): explicit name beats
    ``GRAFT_LLM_API`` env, which defaults to the deterministic fake."""
    name = _resolve(api_name, "GRAFT_LLM_API", DEFAULT_LLM_API)
    try:
        cls = _LLM_CLIENTS[name]
    except KeyError:
        raise ValueError(
            f"unknown LLM API: {name!r}. Supported: {sorted(_LLM_CLIENTS)}"
        ) from None
    return cls()


def get_embedding_client(api_name: str | None = None) -> EmbeddingClient:
    """Factory (``llm_client.py:151-156`` analog): explicit name beats
    ``GRAFT_EMBED_API`` env, which defaults to the deterministic fake."""
    name = _resolve(api_name, "GRAFT_EMBED_API", DEFAULT_EMBED_API)
    try:
        cls = _EMBED_CLIENTS[name]
    except KeyError:
        raise ValueError(
            f"unknown embedding API: {name!r}. "
            f"Supported: {sorted(_EMBED_CLIENTS)}"
        ) from None
    return cls()


def llm_is_local(api_name: str | None = None) -> bool:
    """Whether the selected LLM client runs in-process (class attribute —
    no instantiation, so no key/packages needed to PLAN concurrency)."""
    name = _resolve(api_name, "GRAFT_LLM_API", DEFAULT_LLM_API)
    try:
        cls = _LLM_CLIENTS[name]
    except KeyError:
        # fail at PLAN time with the same message the factory would give —
        # otherwise a typo'd name sizes a remote pool and only errors
        # inside Ray actor construction (code-review r3)
        raise ValueError(
            f"unknown LLM API: {name!r}. Supported: {sorted(_LLM_CLIENTS)}"
        ) from None
    return bool(cls.is_local)


def remote_concurrency() -> int:
    """Actor-pool cap for remote (I/O-bound) clients:
    ``GRAFT_NUM_REMOTE_WORKERS``, default 100 — the reference's
    ``--num-remote-workers`` default (``input_params.py:27-28``)."""
    return int(os.environ.get("GRAFT_NUM_REMOTE_WORKERS", "100"))
