"""Build/rebuild the IVF dense index over the live corpus.

Usage: python -m cadence_rag_tpu.scripts.build_ivf [--corpus chunks]
       [--clusters N] [--nprobe N]

Operator analogue of pgvector's `CREATE INDEX ... USING hnsw` build step:
device spherical k-means over the corpus (ops/ivf.py). After the build,
queries whose candidate count exceeds IVF_MIN_ROWS use the probed-cluster
scan (when DENSE_IVF_ENABLED=true); rows ingested after the build stay in
the exact-scanned overflow tail until the next run.
"""

from __future__ import annotations

import argparse

from ..config import settings
from ..core.index import get_index
from ..logging_utils import configure_logging, get_logger

logger = get_logger(__name__)


def main() -> None:
    parser = argparse.ArgumentParser(description="build IVF dense index")
    parser.add_argument("--corpus", choices=["chunks", "artifact_chunks"],
                        default="chunks")
    parser.add_argument("--clusters", type=int, default=None)
    parser.add_argument("--nprobe", type=int, default=None)
    args = parser.parse_args()
    configure_logging(settings.log_level)

    index = get_index()
    corpus = index.corpus(args.corpus)
    if corpus.count == 0:
        from ..ingest.ingest import rebuild_index_from_store

        rebuild_index_from_store()
    state = corpus.build_ivf(n_clusters=args.clusters, nprobe=args.nprobe)
    logger.info(
        "build_ivf.done corpus=%s rows=%s clusters=%s nprobe=%s overflow=%s",
        args.corpus, state.built_count, state.n_clusters, state.nprobe,
        state.overflow_count,
    )


if __name__ == "__main__":
    main()
