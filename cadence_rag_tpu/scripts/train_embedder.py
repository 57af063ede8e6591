"""Contrastive fine-tuning of the in-process embedder on the corpus.

The reference consumes a frozen external embedding model; this framework
can adapt its own. Training pairs come from structure that needs no labels:
adjacent chunks of the same call are positives (they share topic), in-batch
others are negatives (InfoNCE). Runs dp+tp over a mesh when MESH_SHAPE is
set.

Usage: python -m cadence_rag_tpu.scripts.train_embedder --out params.npz
       [--steps 200] [--batch 32] [--d-model 256] [--n-layers 4]

Afterwards set EMBEDDER_PARAMS_PATH=<out> and EMBEDDINGS_PROVIDER=neural,
then re-run the embedding backfill to refresh the dense index.
"""

from __future__ import annotations

import argparse
from typing import List, Tuple

import numpy as np

from ..config import settings
from ..logging_utils import configure_logging, get_logger
from ..store.db import get_store

logger = get_logger(__name__)


def corpus_pairs(max_pairs: int = 50_000) -> List[Tuple[str, str]]:
    """(anchor, positive) = consecutive chunks within the same call."""
    store = get_store()
    pairs: List[Tuple[str, str]] = []
    with store.read() as conn:
        rows = conn.execute(
            "SELECT call_id, chunk_id, text FROM chunks "
            "ORDER BY call_id, chunk_id"
        ).fetchall()
    prev = None
    for row in rows:
        if prev is not None and prev["call_id"] == row["call_id"]:
            pairs.append((prev["text"], row["text"]))
            if len(pairs) >= max_pairs:
                break
        prev = row
    return pairs


def main() -> None:
    parser = argparse.ArgumentParser(description="train the neural embedder")
    parser.add_argument("--out", required=True)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--d-model", type=int, default=256)
    parser.add_argument("--n-layers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    configure_logging(settings.log_level)

    import jax
    import jax.numpy as jnp

    from ..models.embedder import (
        EmbedderConfig,
        adamw_init,
        batch_tokenize,
        init_params,
        save_params,
        train_step,
    )

    cfg = EmbedderConfig(
        d_model=args.d_model,
        n_layers=args.n_layers,
        n_heads=max(4, args.d_model // 32),
        d_ff=4 * args.d_model,
        embed_dim=int(settings.embeddings_dim),
    )
    pairs = corpus_pairs()
    if len(pairs) < args.batch:
        raise SystemExit(
            f"not enough training pairs ({len(pairs)}); ingest more calls"
        )
    logger.info("train_embedder.start pairs=%s cfg=%s", len(pairs), cfg)

    params = init_params(cfg, jax.random.PRNGKey(args.seed))
    opt_state = adamw_init(params)
    step_fn = jax.jit(
        lambda p, o, a, b: train_step(p, o, a, b, cfg), donate_argnums=(0, 1)
    )
    rng = np.random.default_rng(args.seed)
    loss = None
    for step in range(args.steps):
        idx = rng.choice(len(pairs), size=args.batch, replace=False)
        anchors = jnp.asarray(
            batch_tokenize([pairs[i][0] for i in idx], cfg)
        )
        positives = jnp.asarray(
            batch_tokenize([pairs[i][1] for i in idx], cfg)
        )
        params, opt_state, loss = step_fn(params, opt_state, anchors, positives)
        if step % 20 == 0:
            logger.info("train_embedder.step step=%s loss=%.4f", step, float(loss))
    save_params(args.out, params, cfg)
    logger.info(
        "train_embedder.done steps=%s final_loss=%.4f out=%s",
        args.steps, float(loss), args.out,
    )


if __name__ == "__main__":
    main()
