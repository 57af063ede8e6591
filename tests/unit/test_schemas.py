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


class TestFieldParity:
    """Pin the wire contract: every request model's field set and defaults,
    as data. A rename, a dropped field, or a changed default fails here —
    this is what keeps the reference's clients working unchanged
    (behavioral contract: reference app/schemas.py:8-99)."""

    CONTRACT = {
        "CallRef": {
            "call_id": None, "external_id": None, "external_source": None,
            "source_uri": None, "source_hash": None, "started_at": None,
            "ended_at": None, "title": None, "participants": None,
            "tags": None, "metadata": None,
        },
        "UtteranceIn": {
            "speaker": None, "speaker_id": None, "start_ts_ms": ...,
            "end_ts_ms": ..., "confidence": None, "text": ...,
        },
        "TranscriptPayload": {"format": "json_turns", "content": ...},
        "ChunkingOptions": {
            "target_tokens": 350, "max_tokens": 600, "overlap_tokens": 50,
        },
        "TranscriptIngestRequest": {
            "call_ref": None, "transcript": ..., "options": None,
        },
        "AnalysisArtifactIn": {"kind": ..., "content": ..., "metadata": None},
        "AnalysisIngestRequest": {"call_ref": ..., "artifacts": []},
        "CallIngestRequest": {"call_ref": ...},
        "Budget": {"max_evidence_items": 8, "max_total_chars": 6000},
        "RetrieveFilters": {
            "date_from": None, "date_to": None, "call_ids": None,
            "external_id": None, "external_source": None, "call_tags": None,
        },
        "RetrieveRequest": {
            "query": ..., "intent": "auto", "filters": None,
            "budget": Budget(), "return_style": "evidence_pack_json",
            "debug": False,
        },
        "ExpandRequest": {
            "evidence_id": ..., "window_ms": None, "max_chars": 2000,
        },
    }

    def test_field_names_and_defaults(self):
        import cadence_rag_tpu.schemas as schemas
        from pydantic_core import PydanticUndefined

        for model_name, expected in self.CONTRACT.items():
            model = getattr(schemas, model_name)
            fields = model.model_fields
            assert set(fields) == set(expected), model_name
            for fname, default in expected.items():
                f = fields[fname]
                if default is ...:
                    assert f.is_required(), (model_name, fname)
                elif f.default_factory is not None:
                    assert f.default_factory() == default, (model_name, fname)
                else:
                    assert f.default is not PydanticUndefined
                    assert f.default == default, (model_name, fname)


class TestResponseModels:
    def test_live_evidence_pack_validates(self):
        """The typed response spec must match what the engine actually
        emits (reference returns untyped dicts; here the contract is
        pinned by model)."""
        from cadence_rag_tpu.schemas import EvidencePackResponse

        sample = {
            "query_id": "q-1",
            "intent": "auto",
            "budget": {"max_evidence_items": 8, "max_total_chars": 6000},
            "artifacts": [{
                "evidence_id": "A-3", "call_id": "c", "artifact_id": 1,
                "artifact_chunk_id": 3, "kind": "summary", "snippet": "s",
                "why_relevant": "bm25",
            }],
            "quotes": [{
                "evidence_id": "Q-9", "call_id": "c", "chunk_id": 9,
                "speaker": "Ana", "start_ts_ms": 0, "end_ts_ms": 900,
                "snippet": "t", "why_relevant": "dense + tech_tokens",
            }],
            "notes": {"retrieval": {"planner": "ann"}},
        }
        pack = EvidencePackResponse.model_validate(sample)
        assert pack.quotes[0].chunk_id == 9


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
