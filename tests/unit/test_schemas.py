"""Request-contract validation tests (coverage model: reference
tests/unit/test_schemas.py — ChunkingOptions relations, artifact kind
pattern, expand bounds)."""

import pytest
from pydantic import ValidationError

from cadence_rag_tpu.schemas import (
    AnalysisArtifactIn,
    Budget,
    ChunkingOptions,
    ExpandRequest,
    RetrieveRequest,
)


class TestChunkingOptions:
    def test_defaults(self):
        opts = ChunkingOptions()
        assert (opts.target_tokens, opts.max_tokens, opts.overlap_tokens) == (
            350, 600, 50,
        )

    def test_max_below_target_rejected(self):
        with pytest.raises(ValidationError, match="max_tokens"):
            ChunkingOptions(target_tokens=100, max_tokens=50)

    def test_overlap_must_be_below_target(self):
        with pytest.raises(ValidationError, match="overlap_tokens"):
            ChunkingOptions(target_tokens=50, max_tokens=100, overlap_tokens=50)

    def test_positive_bounds(self):
        with pytest.raises(ValidationError):
            ChunkingOptions(target_tokens=0)


class TestArtifactKind:
    def test_valid_kinds(self):
        for kind in ("summary", "action_items", "notes_2024"):
            assert AnalysisArtifactIn(kind=kind, content="x").kind == kind

    def test_invalid_kinds_rejected(self):
        for kind in ("Action Items", "notes!", "", "A" * 65):
            with pytest.raises(ValidationError):
                AnalysisArtifactIn(kind=kind, content="x")


class TestExpandRequest:
    def test_bounds(self):
        assert ExpandRequest(evidence_id="Q-1").max_chars == 2000
        with pytest.raises(ValidationError):
            ExpandRequest(evidence_id="Q-1", max_chars=0)
        with pytest.raises(ValidationError):
            ExpandRequest(evidence_id="Q-1", max_chars=20001)
        with pytest.raises(ValidationError):
            ExpandRequest(evidence_id="Q-1", window_ms=-1)


class TestRetrieveRequest:
    def test_defaults(self):
        req = RetrieveRequest(query="q")
        assert req.intent == "auto"
        assert req.return_style == "evidence_pack_json"
        assert req.budget == Budget()
        assert req.debug is False

    def test_intent_enum(self):
        for intent in ("decision", "action_items", "who_said",
                       "troubleshooting", "status"):
            assert RetrieveRequest(query="q", intent=intent).intent == intent
        with pytest.raises(ValidationError):
            RetrieveRequest(query="q", intent="bogus")

    def test_return_style_enum(self):
        with pytest.raises(ValidationError):
            RetrieveRequest(query="q", return_style="everything")
