"""Index checkpoint CLI.

Usage:
  python -m cadence_rag_tpu.scripts.index_snapshot save <dir>
  python -m cadence_rag_tpu.scripts.index_snapshot restore <dir>

``save`` snapshots the live device index (rebuilding it from the store
first if empty); ``restore`` loads a snapshot without touching the store.
"""

from __future__ import annotations

import argparse

from ..config import settings
from ..core.checkpoint import restore_index, save_index
from ..core.index import get_index
from ..logging_utils import configure_logging, get_logger

logger = get_logger(__name__)


def main() -> None:
    parser = argparse.ArgumentParser(description="device index snapshots")
    parser.add_argument("action", choices=["save", "restore"])
    parser.add_argument("path")
    args = parser.parse_args()
    configure_logging(settings.log_level)
    if args.action == "save":
        # activate the store's lexical vocab BEFORE any rebuild/save: the
        # stored lex_sig blobs carry its layout, and save_index records
        # the active vocab in checkpoint meta (a save without it would
        # stamp lex_vocab_version=0 over head-layout rows)
        from ..core.vocab import activate_from_store
        from ..store.db import get_store

        activate_from_store(get_store())
        index = get_index()
        if index.chunks.count == 0 and index.artifacts.count == 0:
            from ..ingest.ingest import rebuild_index_from_store

            counts = rebuild_index_from_store()
            logger.info("snapshot.rebuilt chunks=%s artifacts=%s", *counts)
        meta = save_index(args.path)
    else:
        meta = restore_index(args.path)
    logger.info("snapshot.%s path=%s counts=%s", args.action, args.path,
                meta["counts"])


if __name__ == "__main__":
    main()
