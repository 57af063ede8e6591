"""Retrieval engine: filter resolution, exact-vs-ANN planner, lane
orchestration over the device index, RRF fusion and evidence-pack assembly."""

from .retrieve import retrieve_evidence  # noqa: F401
