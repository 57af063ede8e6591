"""Byte-level BPE tokenizer (models/tokenizer.py): loading both on-disk
formats, merge application, byte-roundtrip decode, EOS/max_len handling,
and the +1 pad shift the Qwen3 encoder's pad convention requires
(reference contract: the Triton gateway tokenizes with the HF tokenizer
before the forward — P620 runbook :514-716)."""

import json

import numpy as np
import pytest

from cadence_rag_tpu.models.tokenizer import BpeTokenizer, _bytes_to_unicode


def _base_vocab():
    """All 256 byte-units as tokens (ids 0..255) like a real byte-level
    BPE's base alphabet."""
    b2u = _bytes_to_unicode()
    return {ch: i for i, ch in enumerate(b2u[b] for b in range(256))}


def _toy_tokenizer(**kw):
    vocab = _base_vocab()
    merges = []

    def add_merge(a, b):
        merges.append((a, b))
        vocab.setdefault(a + b, len(vocab))

    # "hello": h+e, he+l, hel+l, hell+o ; "Ġworld": Ġ+w ... (Ġ = space)
    add_merge("h", "e")
    add_merge("he", "l")
    add_merge("hel", "l")
    add_merge("hell", "o")
    space = _bytes_to_unicode()[ord(" ")]
    add_merge(space, "w")
    add_merge(space + "w", "o")
    vocab["<|endoftext|>"] = len(vocab)
    return BpeTokenizer(vocab, merges, **kw)


class TestBpe:
    def test_merges_apply_and_shift(self):
        tok = _toy_tokenizer()
        ids = tok.encode("hello", add_eos=False)
        assert len(ids) == 1  # fully merged
        assert min(ids) >= 1  # +1 shift: 0 stays the pad sentinel
        assert ids[0] == tok.vocab["hello"] + 1

    def test_pretokenize_splits_words(self):
        tok = _toy_tokenizer()
        ids = tok.encode("hello world", add_eos=False)
        # "hello" merges to 1 token; " world" merges Ġw+o then r,l,d
        assert len(ids) > 1
        assert tok.decode(ids) == "hello world"

    def test_roundtrip_unicode(self):
        tok = _toy_tokenizer()
        for text in ("héllo wörld", "日本語テスト", "a\nb\tc",
                     "punct! (x) [y] {z}", "v2.3.7 retry 12345"):
            ids = tok.encode(text, add_eos=False)
            assert tok.decode(ids) == text

    def test_eos_and_max_len(self):
        tok = _toy_tokenizer()
        ids = tok.encode("hello world hello world", max_len=4)
        assert len(ids) <= 4
        assert ids[-1] == tok.eos_id  # EOS survives truncation
        ids2 = tok.encode("hello", add_eos=False, max_len=4)
        assert tok.eos_id not in ids2

    def test_tokenizer_json_load(self, tmp_path):
        tok = _toy_tokenizer()
        data = {
            "model": {
                "type": "BPE",
                "vocab": {
                    k: v for k, v in tok.vocab.items()
                    if k != "<|endoftext|>"
                },
                "merges": [f"{a} {b}" for a, b in tok.ranks],
            },
            "added_tokens": [
                {"content": "<|endoftext|>",
                 "id": tok.vocab["<|endoftext|>"]},
            ],
        }
        path = tmp_path / "tokenizer.json"
        path.write_text(json.dumps(data))
        loaded = BpeTokenizer.from_tokenizer_json(str(path))
        text = "hello world"
        assert loaded.encode(text) == tok.encode(text)
        assert loaded.eos_id == tok.eos_id
        # directory form resolves tokenizer.json too
        via_dir = BpeTokenizer.load(str(tmp_path))
        assert via_dir.encode(text) == tok.encode(text)

    def test_tokenizer_json_pair_merges(self, tmp_path):
        """Newer HF files store merges as [a, b] pairs, not 'a b'."""
        tok = _toy_tokenizer()
        data = {
            "model": {
                "type": "BPE",
                "vocab": dict(tok.vocab),
                "merges": [[a, b] for a, b in tok.ranks],
            },
        }
        path = tmp_path / "tokenizer.json"
        path.write_text(json.dumps(data))
        loaded = BpeTokenizer.from_tokenizer_json(str(path))
        assert loaded.encode("hello") == tok.encode("hello")

    def test_vocab_merges_load(self, tmp_path):
        tok = _toy_tokenizer()
        (tmp_path / "vocab.json").write_text(json.dumps(tok.vocab))
        (tmp_path / "merges.txt").write_text(
            "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in tok.ranks)
        )
        loaded = BpeTokenizer.load(str(tmp_path))
        assert loaded.encode("hello world") == tok.encode("hello world")

    def test_batch_tokenize_bpe_path(self, tmp_path):
        from cadence_rag_tpu.models.qwen3 import batch_tokenize, preset

        tok = _toy_tokenizer()
        cfg = preset("tiny")
        out = batch_tokenize(["hello world", "hello"], cfg, seq_len=16,
                             bpe=tok)
        assert out.shape == (2, 16)
        assert out.dtype == np.int32
        assert (out >= 0).all()
        # row 1 is shorter -> right-padded with the 0 sentinel
        assert out[1, -1] == 0
        assert tok.eos_id in out[0].tolist()

    def test_provider_rejects_oversized_vocab(self, tmp_store, tmp_path,
                                              monkeypatch):
        """tiny preset has 512 vocab buckets; a 257+-token real vocab
        (+1 shift) must be refused instead of silently aliasing ids."""
        from cadence_rag_tpu.models.qwen3 import Qwen3EmbeddingProvider, preset

        tok = _toy_tokenizer()
        data = {"model": {"type": "BPE", "vocab": dict(tok.vocab),
                          "merges": [f"{a} {b}" for a, b in tok.ranks]}}
        (tmp_path / "tokenizer.json").write_text(json.dumps(data))
        monkeypatch.setattr(tmp_store, "qwen3_tokenizer_path",
                            str(tmp_path))
        monkeypatch.setattr(tmp_store, "embeddings_dim", 32)
        cfg = preset("tiny")
        assert tok.vocab_size <= cfg.vocab_buckets  # tiny fits (512)
        provider = Qwen3EmbeddingProvider(cfg=cfg)
        assert provider.bpe is not None
        res = provider.embed(["hello world", "hello"])
        assert res.vectors.shape == (2, 32)
        norms = np.linalg.norm(res.vectors, axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-2)
        assert provider.model_id.endswith("-bpe")
