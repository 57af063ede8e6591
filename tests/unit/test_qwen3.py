"""Qwen3-shaped encoder tests (models/qwen3.py): vector contract, pooling,
tp-sharded parity with the unsharded forward — all tiny-config CPU runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadence_rag_tpu.models import qwen3 as q3

TINY = q3.PRESETS["tiny"]


class TestQwen3Encode:
    def test_vector_contract_unit_norm(self):
        params = q3.init_params(TINY, jax.random.PRNGKey(0))
        tokens = jnp.asarray(
            q3.batch_tokenize(["hello world", "other text entirely"], TINY)
        )
        out = q3.encode(params, tokens, TINY)
        assert out.shape == (2, TINY.embed_dim)
        norms = np.linalg.norm(np.asarray(out), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    def test_truncation_is_hidden_prefix(self):
        assert TINY.embed_dim < TINY.d_model  # 2560 -> 1024 shape contract

    def test_last_token_pooling_tracks_last_real_token(self):
        params = q3.init_params(TINY, jax.random.PRNGKey(0))
        short = jnp.asarray(q3.batch_tokenize(["hello world"], TINY))
        longer = jnp.asarray(q3.batch_tokenize(["hello world extra"], TINY))
        va = np.asarray(q3.encode(params, short, TINY))
        vb = np.asarray(q3.encode(params, longer, TINY))
        assert not np.allclose(va, vb)

    def test_trailing_pad_invariance(self):
        """The pooled vector must not depend on pad width (causal mask +
        last-token pooling): same text at two static seq lengths."""
        params = q3.init_params(TINY, jax.random.PRNGKey(0))
        t16 = jnp.asarray(q3.batch_tokenize(["one two three"], TINY, seq_len=16))
        t32 = jnp.asarray(q3.batch_tokenize(["one two three"], TINY, seq_len=32))
        va = np.asarray(q3.encode(params, t16, TINY))
        vb = np.asarray(q3.encode(params, t32, TINY))
        np.testing.assert_allclose(va, vb, atol=2e-2)

    def test_batch_independence(self):
        """Row i's embedding must not depend on other rows in the batch."""
        params = q3.init_params(TINY, jax.random.PRNGKey(0))
        solo = jnp.asarray(q3.batch_tokenize(["target text here"], TINY))
        batch = jnp.asarray(
            q3.batch_tokenize(
                ["target text here", "noise row", "another noise row"], TINY
            )
        )
        va = np.asarray(q3.encode(params, solo, TINY))[0]
        vb = np.asarray(q3.encode(params, batch, TINY))[0]
        np.testing.assert_allclose(va, vb, atol=2e-2)

    def test_param_count_4b_preset(self):
        cfg = q3.preset("4b")
        count = cfg.param_count()
        # Qwen3-4B is ~4.0B params (embedding 389M + 36 x ~101M)
        assert 3.8e9 < count < 4.3e9, count

    def test_save_load_roundtrip(self, tmp_path):
        params = q3.init_params(TINY, jax.random.PRNGKey(0))
        path = str(tmp_path / "q.npz")
        q3.save_params(path, params, TINY)
        restored, cfg = q3.load_params(path)
        assert cfg == TINY
        tokens = jnp.asarray(q3.batch_tokenize(["round trip"], TINY))
        np.testing.assert_allclose(
            np.asarray(q3.encode(params, tokens, TINY)),
            np.asarray(q3.encode(restored, tokens, TINY)),
            atol=1e-6,
        )


class TestQwen3Sharded:
    def test_tp_sharded_matches_single_device(self):
        from cadence_rag_tpu.parallel.mesh import make_mesh

        devices = jax.devices()[:8]
        mesh = make_mesh("data:2,model:4", devices=devices)
        params = q3.init_params(TINY, jax.random.PRNGKey(0))
        tokens = jnp.asarray(
            q3.batch_tokenize(
                ["alpha beta gamma", "delta epsilon", "zeta eta theta iota",
                 "kappa"],
                TINY,
            )
        )
        ref = np.asarray(q3.encode(params, tokens, TINY))

        shardings = q3.param_shardings(TINY, mesh)
        sharded_params = {
            name: jax.device_put(arr, shardings[name])
            for name, arr in params.items()
        }
        from jax.sharding import NamedSharding, PartitionSpec as P

        tok_sharded = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
        with mesh:
            out = jax.jit(
                lambda p, t: q3.encode(p, t, TINY, sharded=True)
            )(sharded_params, tok_sharded)
            out = np.asarray(jax.block_until_ready(out))
        np.testing.assert_allclose(out, ref, atol=2e-2)

    def test_init_born_sharded(self):
        from cadence_rag_tpu.parallel.mesh import make_mesh

        mesh = make_mesh("data:1,model:8", devices=jax.devices()[:8])
        shardings = q3.param_shardings(TINY, mesh)
        params = q3.init_params(
            TINY, jax.random.PRNGKey(1), shardings=shardings
        )
        sh = params["w_gate"].sharding
        assert isinstance(sh, jax.sharding.NamedSharding)
        assert sh.spec == jax.sharding.PartitionSpec(None, None, "model")


class TestQwen3Provider:
    def test_provider_registry_contract(self, monkeypatch):
        from cadence_rag_tpu.config import settings
        from cadence_rag_tpu.embed import provider as prov
        from cadence_rag_tpu.models.qwen3 import Qwen3EmbeddingProvider

        monkeypatch.setattr(settings, "embeddings_provider", "qwen3")
        monkeypatch.setattr(settings, "embeddings_dim", TINY.embed_dim)
        monkeypatch.setattr(
            Qwen3EmbeddingProvider, "_instance",
            Qwen3EmbeddingProvider(TINY),
        )
        prov.reset_embed_cache()
        result = prov.embed_texts(["a first text", "a second text", "third"])
        assert np.asarray(result.vectors).shape == (3, TINY.embed_dim)
        assert result.model.startswith("qwen3-shaped-")

    def test_dim_mismatch_fails_at_startup(self, monkeypatch):
        from cadence_rag_tpu.config import settings
        from cadence_rag_tpu.models.qwen3 import Qwen3EmbeddingProvider

        monkeypatch.setattr(settings, "embeddings_dim", TINY.embed_dim + 1)
        with pytest.raises(RuntimeError, match="EMBEDDINGS_DIM"):
            Qwen3EmbeddingProvider(TINY)
