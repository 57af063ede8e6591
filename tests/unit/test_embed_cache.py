"""Cross-request embedding LRU (embed/provider.py, EMBED_CACHE_SIZE)."""

import numpy as np
import pytest

from cadence_rag_tpu.config import settings
from cadence_rag_tpu.embed import provider as prov


class CountingProvider:
    model_id = "counting"

    def __init__(self):
        self.calls = []

    def embed(self, texts):
        self.calls.append(list(texts))
        rng = np.random.default_rng(
            abs(hash(tuple(texts))) % (2**32)
        )
        vecs = np.stack([
            np.full(int(settings.embeddings_dim), float(len(t)),
                    dtype=np.float32)
            for t in texts
        ])
        del rng
        return prov.EmbeddingResult(vecs, "counting-v1")


@pytest.fixture()
def counting(monkeypatch):
    p = CountingProvider()
    monkeypatch.setattr(prov, "get_provider", lambda: p)
    monkeypatch.setattr(prov, "provider_kind", lambda: "counting")
    monkeypatch.setattr(settings, "embeddings_dim", 8)
    prov.reset_embed_cache()
    yield p
    prov.reset_embed_cache()


class TestEmbedCache:
    def test_off_by_default_always_calls(self, counting, monkeypatch):
        monkeypatch.setattr(settings, "embed_cache_size", 0)
        prov.embed_texts(["alpha"])
        prov.embed_texts(["alpha"])
        assert len(counting.calls) == 2

    def test_repeat_hits_cache(self, counting, monkeypatch):
        monkeypatch.setattr(settings, "embed_cache_size", 16)
        first = prov.embed_texts(["alpha", "beta"])
        second = prov.embed_texts(["alpha", "beta"])
        assert len(counting.calls) == 1
        np.testing.assert_array_equal(first.vectors, second.vectors)
        assert second.model == "counting-v1"

    def test_partial_hit_embeds_only_misses(self, counting, monkeypatch):
        monkeypatch.setattr(settings, "embed_cache_size", 16)
        prov.embed_texts(["alpha"])
        result = prov.embed_texts(["gamma!", "alpha", "delta!!"])
        assert counting.calls[-1] == ["gamma!", "delta!!"]
        # row order matches the request, mixing cached + fresh rows
        assert result.vectors[0][0] == 6.0
        assert result.vectors[1][0] == 5.0
        assert result.vectors[2][0] == 7.0

    def test_lru_eviction(self, counting, monkeypatch):
        monkeypatch.setattr(settings, "embed_cache_size", 2)
        prov.embed_texts(["a1"])
        prov.embed_texts(["b22"])
        prov.embed_texts(["a1"])     # refresh a1
        prov.embed_texts(["c333"])   # evicts b22
        n = len(counting.calls)
        prov.embed_texts(["a1"])     # hit
        assert len(counting.calls) == n
        prov.embed_texts(["b22"])    # miss again
        assert len(counting.calls) == n + 1

    def test_key_includes_model_config(self, counting, monkeypatch):
        monkeypatch.setattr(settings, "embed_cache_size", 16)
        prov.embed_texts(["alpha"])
        monkeypatch.setattr(settings, "embeddings_model_id", "other-model")
        prov.embed_texts(["alpha"])
        assert len(counting.calls) == 2
