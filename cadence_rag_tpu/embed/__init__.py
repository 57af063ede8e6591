"""Embedding providers and the backfill pipeline.

The reference consumes an external HTTP `/embed` service (Triton gateway
serving Qwen3-Embedding-4B: tokenize -> last-token pool -> truncate
2560->1024 -> L2 normalize; reference: app/embeddings.py +
P620_..RUNBOOK.md:703-715). We keep that contract pluggable and add two
in-process providers: a deterministic hash embedder (tests/bench) and a JAX
transformer embedder (models/embedder.py).
"""

from .provider import (  # noqa: F401
    EmbeddingError,
    EmbeddingResult,
    embed_texts,
    embed_texts_batched,
    embeddings_enabled,
    get_provider,
)
