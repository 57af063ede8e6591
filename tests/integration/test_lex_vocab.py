"""Lexical vocab head: learned collision-free buckets for frequent
features (core/vocab.py, ops/hashing.apply_vocab).

The reference's BM25 lane keeps exact per-term postings (pg_search index,
alembic/versions/0005:17-37); our hashed lane loses top-k fidelity to
bucket collisions. The vocab head gives the top-df features dedicated
buckets — these tests pin the placement semantics, the build/apply
operator flow, checkpoint round-tripping, and layout-divergence refusal.
"""

import numpy as np
import pytest

from cadence_rag_tpu.config import settings
from cadence_rag_tpu.core import vocab as vocab_mod
from cadence_rag_tpu.core.index import get_index, reset_index
from cadence_rag_tpu.engine.retrieve import retrieve_evidence
from cadence_rag_tpu.ingest import featurize
from cadence_rag_tpu.ingest.ingest import ingest_transcript
from cadence_rag_tpu.ops import hashing
from cadence_rag_tpu.schemas import (
    CallRef,
    ChunkingOptions,
    RetrieveRequest,
    UtteranceIn,
)
from cadence_rag_tpu.store.db import get_store


def make_utterances(texts):
    return [
        UtteranceIn(
            speaker="Ana", start_ts_ms=i * 1000, end_ts_ms=i * 1000 + 900,
            text=t,
        )
        for i, t in enumerate(texts)
    ]


class TestApplyVocabPlacement:
    def test_none_matches_plain_layout(self):
        hashes = np.random.default_rng(0).integers(
            0, 2**63, size=64, dtype=np.uint64
        )
        buckets, signs = hashing.apply_vocab(hashes, 4096, None)
        exp_b = (hashes % np.uint64(4096)).astype(np.int64)
        np.testing.assert_array_equal(buckets, exp_b)
        assert set(np.unique(signs)) <= {-1.0, 1.0}

    def test_head_features_get_dedicated_buckets(self):
        rng = np.random.default_rng(1)
        vocab = np.sort(rng.integers(0, 2**63, size=8, dtype=np.uint64))
        tail_hashes = rng.integers(0, 2**63, size=100, dtype=np.uint64)
        tail_hashes = tail_hashes[~np.isin(tail_hashes, vocab)]
        hashes = np.concatenate([vocab, tail_hashes])
        buckets, signs = hashing.apply_vocab(hashes, 64, vocab)
        # head features land at their sorted rank with sign +1
        np.testing.assert_array_equal(buckets[:8], np.arange(8))
        np.testing.assert_array_equal(signs[:8], np.ones(8, np.float32))
        # tail features land in [head, dim)
        assert (buckets[8:] >= 8).all()
        assert (buckets[8:] < 64).all()

    def test_doc_signature_from_raw_matches_legacy(self):
        text = "the ECONNRESET retry landed in v2.3.1 after the rollback"
        h, t = hashing.raw_feature_arrays(text)
        sig_a, touched_a, dl_a = hashing.doc_signature_from_raw(
            h, t, 1024, 40.0, None
        )
        sig_b, touched_b, dl_b = hashing.doc_signature(text, 1024, 40.0)
        np.testing.assert_array_equal(sig_a, sig_b)
        np.testing.assert_array_equal(touched_a, touched_b)
        assert dl_a == dl_b

    def test_query_features_from_raw_match_legacy(self):
        text = "object store tiering decision"
        h, t = hashing.raw_feature_arrays(text)
        got = hashing.query_feature_arrays_from_raw(h, t, 1024, None)
        exp = hashing.query_feature_arrays(text, 1024)
        for g, e in zip(got, exp):
            np.testing.assert_array_equal(g, e)

    def test_head_too_large_raises(self):
        vocab = np.arange(1024, dtype=np.uint64)
        with pytest.raises(ValueError):
            hashing.apply_vocab(np.arange(4, dtype=np.uint64), 1024, vocab)


@pytest.fixture()
def corpus_store(tmp_store):
    texts = [
        "the ECONNRESET fix landed in v2.3.1 after a long rollback debate",
        "object store tiering to SSD approved by the platform team",
        "lenovo BOM finalized for the bake-off next quarter",
        "retry storms caused the ECONNRESET cascade in the gateway",
        "tiering policy review moved to thursday standup",
        "gateway timeout budget raised to nine hundred milliseconds",
    ]
    for i, t in enumerate(texts):
        ingest_transcript(
            CallRef(external_id=f"vocab-{i}", title=f"call {i}"),
            make_utterances([t]),
            ChunkingOptions(target_tokens=10, max_tokens=60, overlap_tokens=0),
        )
    return texts


class TestBuildApply:
    def test_build_and_apply_roundtrip(self, corpus_store):
        store = get_store()
        index = get_index()
        req = RetrieveRequest(
            query="ECONNRESET rollback", return_style="ids_only"
        )
        before = retrieve_evidence(req)["retrieved_ids"]
        assert before

        summary = vocab_mod.build_and_apply(store, index, head=128)
        assert summary["version"] == 1
        assert 0 < summary["head"] <= 128
        vocab, version = featurize.active_vocab()
        assert version == 1 and vocab is not None

        # the hot lexical question still retrieves the right documents
        after = retrieve_evidence(req)["retrieved_ids"]
        assert set(before[:2]) <= set(after[:3])

        # store blobs now carry the head layout: a fresh rebuild from the
        # store produces bit-identical device rows
        live_lex = np.asarray(index.chunks.lex)[: index.chunks.count].copy()
        live_ids = index.chunks.h_ids[: index.chunks.count].copy()
        reset_index()
        vocab_mod.activate_from_store(store)
        from cadence_rag_tpu.ingest.ingest import rebuild_index_from_store

        rebuild_index_from_store()
        index2 = get_index()
        rebuilt = np.asarray(index2.chunks.lex)[: index2.chunks.count]
        order = np.argsort(index2.chunks.h_ids[: index2.chunks.count])
        live_order = np.argsort(live_ids)
        np.testing.assert_array_equal(
            rebuilt[order], live_lex[live_order]
        )

    def test_new_ingest_follows_active_vocab(self, corpus_store):
        store = get_store()
        index = get_index()
        vocab_mod.build_and_apply(store, index, head=128)
        ingest_transcript(
            CallRef(external_id="vocab-new", title="post-vocab call"),
            make_utterances(["fresh ECONNRESET report from the field"]),
            ChunkingOptions(target_tokens=10, max_tokens=60, overlap_tokens=0),
        )
        with store.read() as conn:
            row = conn.execute(
                "SELECT c.lex_sig, c.text FROM chunks c JOIN calls k ON "
                "c.call_id=k.call_id WHERE k.external_id='vocab-new'"
            ).fetchone()
        stored = np.frombuffer(row["lex_sig"], dtype=np.int8)
        expected, _, _ = featurize.lexical_signature(
            row["text"], index.chunks.avgdl or 400.0
        )
        # the head-layout placement matches (exact values can differ by a
        # quantization step: ingest used the running avgdl of its moment)
        vocab, _ = featurize.active_vocab()
        h, t = hashing.raw_feature_arrays(row["text"])
        buckets, _signs = hashing.apply_vocab(
            h, int(settings.lexical_dim), vocab
        )
        head_buckets = np.unique(buckets[buckets < vocab.size])
        assert head_buckets.size  # frequent terms actually hit the head
        assert (stored[head_buckets] > 0).all()  # head signs are +1
        np.testing.assert_array_equal(
            stored[head_buckets] > 0, expected[head_buckets] > 0
        )
        np.testing.assert_allclose(
            stored[head_buckets], expected[head_buckets], atol=1
        )

    def test_dim_mismatch_refused(self, corpus_store):
        store = get_store()
        vocab_mod.save_vocab(
            store, np.arange(16, dtype=np.uint64), dim=2048, applied=True
        )  # wrong dim on purpose
        with pytest.raises(RuntimeError, match="LEXICAL_DIM"):
            vocab_mod.activate_from_store(store)

    def test_interrupted_apply_is_refused(self, corpus_store):
        """A crash between save_vocab and mark_applied leaves lex_sig
        blobs possibly mixing two layouts; activation must fail fast
        instead of silently serving them."""
        store = get_store()
        vocab_mod.save_vocab(
            store, np.arange(16, dtype=np.uint64) + 1,
            dim=int(settings.lexical_dim),
        )  # applied=0: simulates the crash window
        with pytest.raises(RuntimeError, match="never completed"):
            vocab_mod.activate_from_store(store)
        # re-running the operator flow clears the dangling row and heals
        index = get_index()
        summary = vocab_mod.build_and_apply(store, index, head=64)
        assert summary["version"] >= 1
        assert vocab_mod.activate_from_store(store) == summary["version"]

    def test_refresh_if_changed_tracks_rebuilds(self, corpus_store):
        """Long-lived writer processes re-check the store's applied vocab
        each cycle (scripts/ingest_worker.py)."""
        store = get_store()
        index = get_index()
        assert vocab_mod.refresh_if_changed(store) is None  # no vocab yet
        summary = vocab_mod.build_and_apply(store, index, head=64)
        featurize.set_active_vocab(None, 0)  # simulate a stale process
        assert vocab_mod.refresh_if_changed(store) == summary["version"]
        assert vocab_mod.refresh_if_changed(store) is None  # now current

    def test_vocab_digest_distinguishes_content(self):
        a = vocab_mod.vocab_digest(np.arange(8, dtype=np.uint64))
        b = vocab_mod.vocab_digest(np.arange(8, dtype=np.uint64) + 1)
        assert a and b and a != b
        assert vocab_mod.vocab_digest(None) == ""

    def test_fidelity_improves_with_head(self):
        from cadence_rag_tpu.evals.lexical_fidelity import measure_fidelity

        res = measure_fidelity(
            n_docs=400, n_queries=24, dims=[1024], head=512, seed=3
        )
        plain = res["overlap_at_k"]["1024"]["vs_feature_bm25"]
        headed = res["overlap_at_k"]["1024+head512"]["vs_feature_bm25"]
        assert headed > plain


class TestCheckpointInterlock:
    def test_checkpoint_carries_vocab(self, corpus_store, tmp_path):
        from cadence_rag_tpu.core.checkpoint import restore_index, save_index

        store = get_store()
        index = get_index()
        vocab_mod.build_and_apply(store, index, head=64)
        active_before, ver_before = featurize.active_vocab()
        req = RetrieveRequest(query="tiering SSD", return_style="ids_only")
        before = retrieve_evidence(req)["retrieved_ids"]

        meta = save_index(str(tmp_path / "snap"))
        assert meta["lex_vocab_version"] == ver_before

        reset_index()
        assert featurize.active_vocab() == (None, 0)
        restore_index(str(tmp_path / "snap"))
        active_after, ver_after = featurize.active_vocab()
        assert ver_after == ver_before
        np.testing.assert_array_equal(active_after, active_before)
        assert retrieve_evidence(req)["retrieved_ids"] == before

    def test_prevocab_checkpoint_clears_vocab(self, corpus_store, tmp_path):
        from cadence_rag_tpu.core.checkpoint import restore_index, save_index

        save_index(str(tmp_path / "snap"))  # no vocab built yet
        featurize.set_active_vocab(
            np.arange(8, dtype=np.uint64) + 1, 7
        )  # simulate stale process state
        restore_index(str(tmp_path / "snap"))
        assert featurize.active_vocab() == (None, 0)


class TestDriftSignal:
    def test_index_stats_reports_vocab_and_drift(self, corpus_store):
        from cadence_rag_tpu.serve.api import index_stats_endpoint

        store = get_store()
        index = get_index()
        _status, before = index_stats_endpoint(None)
        assert "lex_vocab" not in before["chunks"]  # no vocab yet

        vocab_mod.build_and_apply(store, index, head=64)
        _status, after = index_stats_endpoint(None)
        lv = after["chunks"]["lex_vocab"]
        assert lv["version"] == 1 and lv["head"] == 64
        assert lv["hot_tail_buckets"] >= 0
        assert lv["head_median_df"] > 0


class TestOplogReplay:
    def test_scatter_lex_apply_matches_leader(self, corpus_store):
        """Follower-side replay of the vocab re-featurize op: _apply's
        scatter_lex branch must land the same rows the leader's set_lex
        wrote (parallel/oplog.py)."""
        import numpy as np

        from cadence_rag_tpu.parallel import oplog

        index = get_index()
        corpus = index.chunks
        n = corpus.count
        before = np.asarray(corpus.lex)[:n].copy()
        ids = corpus.h_ids[:2].tolist()
        new_rows = np.arange(
            2 * corpus.lex_dim, dtype=np.int8
        ).reshape(2, corpus.lex_dim)
        corpus.set_lex(ids, new_rows)
        leader_state = np.asarray(corpus.lex)[:n].copy()
        assert not np.array_equal(leader_state, before)

        # reset rows, then replay the equivalent op through _apply
        corpus.set_lex(ids, before[:2])
        pos = corpus.position_of(ids)
        oplog._apply(
            index, "scatter_lex", {"corpus": "chunks"},
            {"pos": pos.astype(np.int32), "vals": new_rows},
        )
        np.testing.assert_array_equal(
            np.asarray(corpus.lex)[:n], leader_state
        )
