"""Host-side ingest pipelines: transcript/artifact chunking, tech-token
extraction, call resolution and idempotency, format adapters, and the
drop-folder job queue. Ingest output feeds the device index directly
(no DB round-trip for search state)."""
