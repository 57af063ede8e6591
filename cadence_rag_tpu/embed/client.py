"""HTTP embedding client (reference-compatible `/embed` contract).

POST {base}/embed {"texts": [...], "model": id} -> {"embeddings": [[...]],
"model": id}; non-200, transport errors, missing/miscounted vectors all
raise EmbeddingError (reference contract: app/embeddings.py:48-82).
"""

from __future__ import annotations

from typing import Sequence

import httpx

from ..config import settings
from .provider import EmbeddingError, EmbeddingResult


class HttpEmbeddingProvider:
    def __init__(self) -> None:
        base = settings.embeddings_base_url.strip().rstrip("/")
        if not base:
            raise EmbeddingError("EMBEDDINGS_BASE_URL is not configured")
        self.base_url = base
        self.model_id = settings.embeddings_model_id

    def embed(self, texts: Sequence[str]) -> EmbeddingResult:
        payload = {"texts": list(texts), "model": self.model_id}
        try:
            with httpx.Client(
                timeout=httpx.Timeout(settings.embeddings_timeout_s)
            ) as client:
                response = client.post(f"{self.base_url}/embed", json=payload)
        except httpx.HTTPError as exc:
            raise EmbeddingError(f"embedding HTTP request failed: {exc}") from exc
        if response.status_code != 200:
            detail = response.text.strip()[:400]
            raise EmbeddingError(
                f"embedding service returned {response.status_code}: {detail}"
            )
        body = response.json()
        raw = body.get("embeddings")
        if not isinstance(raw, list):
            raise EmbeddingError("embedding response missing 'embeddings' list")
        return EmbeddingResult(
            vectors=raw, model=str(body.get("model") or self.model_id)
        )
