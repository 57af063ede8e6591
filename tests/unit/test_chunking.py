"""Ingest pure-logic tests (coverage model: reference
tests/unit/test_ingest_utils.py — tech tokens incl. domain lexicon, chunker
max-token invariant, bullet itemization + determinism)."""

from cadence_rag_tpu.ingest.chunking import (
    Utterance,
    build_artifact_chunks,
    build_chunks,
    count_tokens,
    extract_tech_tokens,
    transcript_hash,
)
from cadence_rag_tpu.schemas import ChunkingOptions, UtteranceIn


def _utts(texts, tokens_each=None):
    out = []
    for i, t in enumerate(texts):
        out.append(
            Utterance(
                utterance_id=i + 1,
                speaker=f"S{i % 2}",
                speaker_id=None,
                start_ts_ms=i * 1000,
                end_ts_ms=i * 1000 + 900,
                confidence=None,
                text=t,
                token_count=count_tokens(t),
            )
        )
    return out


class TestTechTokens:
    def test_structural_patterns(self):
        text = (
            "hit ECONNRESET after HTTP 503 from https://api.example.com/v2 "
            "on 10.0.0.7, see JIRA-1234 and commit deadbeef1 in /var/log/app"
        )
        tokens = {t.lower() for t in extract_tech_tokens(text)}
        assert "econnreset" in tokens
        assert "jira-1234" in tokens
        assert "10.0.0.7" in tokens
        assert any(t.startswith("https://") for t in tokens)
        assert "/var/log/app" in tokens

    def test_domain_lexicon_canonicalization(self):
        tokens = extract_tech_tokens(
            "the bill of materials for the lenovo build versus dell"
        )
        assert "BOM" in tokens
        assert "Lenovo" in tokens
        assert "Dell" in tokens
        assert "vs" in tokens

    def test_dedupe_preserves_order_case_insensitive(self):
        tokens = extract_tech_tokens("SSD ssd Ssd azure AZURE")
        assert tokens.count("SSD") == 1
        assert tokens.count("Azure") == 1

    def test_gated_fast_path_matches_ungated_oracle(self):
        """extract_tech_tokens prunes regexes via substring pre-gates;
        outputs (including ORDER) must equal the plain 33-regex loop on
        adversarial and fuzzed inputs."""
        import random

        from cadence_rag_tpu.ingest.chunking import (
            _extract_tech_tokens_ungated,
        )

        fixed = [
            "",
            "plain sentence with no identifiers at all",
            "hit ECONNRESET after HTTP 503 from https://api.example.com/v2 "
            "on 10.0.0.7, see JIRA-1234 and commit deadbeef1 in /var/log/app",
            "the bill of materials for the lenovo build versus dell",
            "object storage tiering on AWS vs Azure vs GCP bake-off",
            "supermicro SMC head-to-head against the incumbent, ORA-00600",
            "v2.3.1 rollout; E_FAIL; competing bids; amazon web services",
            "Bakeoff bakeoff BAKE-OFF smc OBJECT store obj",
            "ecONNreset http503 ora-1234 10.0.0 1.2 vs. versus Vs",
            "Edge case: E alone, -5, 1.2.3.4.5, //double//slash//",
            "google cloud platform vs oracle cloud infrastructure",
            "abcdef1234567890 deadbeef cafebabe0 12345678",
        ]
        vocab = ("object store tiering SSD lenovo dell smc AWS azure gcp "
                 "google oci oracle compete incumbent bake-off versus vs "
                 "HTTP 503 ECONNRESET ORA-600 v1.2.3 10.0.0.1 JIRA-9 "
                 "/etc/hosts deadbeef build bom bill of materials word "
                 "the a and . - /").split()
        rng = random.Random(0)
        fuzz = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
            for _ in range(300)
        ]
        for text in fixed + fuzz:
            assert extract_tech_tokens(text) == (
                _extract_tech_tokens_ungated(text)
            ), repr(text)


class TestChunker:
    def test_max_token_invariant(self):
        texts = ["word " * 40 for _ in range(30)]  # ~80 tokens each
        opts = ChunkingOptions(target_tokens=100, max_tokens=150, overlap_tokens=20)
        chunks = build_chunks(_utts(texts), opts)
        for c in chunks:
            # only a single oversized utterance may exceed max
            if len(c.utterance_ids) > 1:
                assert c.token_count <= opts.max_tokens

    def test_all_utterances_covered_and_progress(self):
        texts = [f"utterance number {i} says something" for i in range(20)]
        opts = ChunkingOptions(target_tokens=10, max_tokens=20, overlap_tokens=3)
        chunks = build_chunks(_utts(texts), opts)
        covered = set()
        for c in chunks:
            covered.update(c.utterance_ids)
        assert covered == set(range(1, 21))

    def test_single_speaker_label_and_multi(self):
        utts = _utts(["hello there friend"] * 3)
        for u in utts:
            u.speaker = "Alice"
        opts = ChunkingOptions(target_tokens=100, max_tokens=200, overlap_tokens=0)
        chunks = build_chunks(utts, opts)
        assert chunks[0].speaker == "Alice"
        utts[1].speaker = "Bob"
        chunks = build_chunks(utts, opts)
        assert chunks[0].speaker == "MULTI"

    def test_chunk_text_speaker_prefixed(self):
        utts = _utts(["the quick fox"])
        chunks = build_chunks(
            utts, ChunkingOptions(target_tokens=5, max_tokens=10, overlap_tokens=0)
        )
        assert chunks[0].text == "S0: the quick fox"


class TestArtifactChunks:
    def test_bullet_itemization_for_action_items(self):
        content = "Next steps:\n- ship the BOM to lenovo\n- test ECONNRESET fix\n"
        chunks = build_artifact_chunks("action_items", content)
        bullet_chunks = [c for c in chunks if c.content.startswith("-")]
        assert len(bullet_chunks) == 2
        assert any("BOM" in c.tech_tokens for c in bullet_chunks)

    def test_paragraphs_for_summary_kind(self):
        content = "First paragraph here.\n\nSecond paragraph there.\n"
        chunks = build_artifact_chunks("summary", content)
        assert [c.content for c in chunks] == [
            "First paragraph here.",
            "Second paragraph there.",
        ]
        assert [c.ordinal for c in chunks] == [0, 1]

    def test_determinism(self):
        content = "Decisions:\n1. go with azure\n2. drop the dell quote\n"
        a = build_artifact_chunks("decisions", content)
        b = build_artifact_chunks("decisions", content)
        assert [(c.ordinal, c.content, c.start_char, c.end_char) for c in a] == [
            (c.ordinal, c.content, c.start_char, c.end_char) for c in b
        ]

    def test_empty_content(self):
        assert build_artifact_chunks("summary", "   \n  ") == []


class TestTranscriptHash:
    def test_stable_and_sensitive(self):
        utts = [
            UtteranceIn(speaker="A", start_ts_ms=0, end_ts_ms=10, text="hi there"),
            UtteranceIn(speaker="B", start_ts_ms=10, end_ts_ms=20, text="hello"),
        ]
        opts = ChunkingOptions()
        h1 = transcript_hash(utts, opts)
        h2 = transcript_hash(utts, opts)
        assert h1 == h2 and len(h1) == 64
        h3 = transcript_hash(utts, ChunkingOptions(target_tokens=100))
        assert h3 != h1
        utts2 = [*utts]
        utts2[0] = UtteranceIn(
            speaker="A", start_ts_ms=0, end_ts_ms=10, text="hi there!"
        )
        assert transcript_hash(utts2, opts) != h1
