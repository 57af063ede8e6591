"""End-to-end embedder training: pairs from the store -> training loop ->
saved params usable by the neural provider."""

import sys

import pytest

from cadence_rag_tpu.ingest.ingest import ingest_transcript
from cadence_rag_tpu.schemas import CallRef, ChunkingOptions, UtteranceIn
from cadence_rag_tpu.scripts.train_embedder import corpus_pairs, main


@pytest.fixture()
def training_corpus(tmp_store):
    texts = [
        f"utterance {i} about the object store and ECONNRESET retries "
        f"with tiering to SSD and version v2.{i}.0 on the cluster"
        for i in range(24)
    ]
    ingest_transcript(
        CallRef(external_id="train-1"),
        [UtteranceIn(speaker="A", start_ts_ms=i * 1000, end_ts_ms=i * 1000 + 900,
                     text=t) for i, t in enumerate(texts)],
        ChunkingOptions(target_tokens=15, max_tokens=30, overlap_tokens=0),
    )
    return tmp_store


class TestTrainScript:
    def test_pairs_from_store(self, training_corpus):
        pairs = corpus_pairs()
        assert len(pairs) >= 4
        for anchor, positive in pairs:
            assert anchor and positive

    def test_training_run_saves_params(self, training_corpus, tmp_path,
                                       monkeypatch):
        out = str(tmp_path / "tuned.npz")
        monkeypatch.setattr(
            sys, "argv",
            ["train_embedder", "--out", out, "--steps", "3", "--batch", "4",
             "--d-model", "32", "--n-layers", "1"],
        )
        main()
        from cadence_rag_tpu.models.embedder import load_params

        params, cfg = load_params(out)
        assert cfg.d_model == 32
        assert cfg.embed_dim == int(training_corpus.embeddings_dim)
