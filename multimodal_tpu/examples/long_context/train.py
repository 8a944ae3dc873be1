"""Long-context LM training recipe over a dp × fsdp × cp mesh.

Green-field capability (SURVEY §5.7) — the reference has nothing like it.
``Trainer.fit`` drives the full stack: params FSDP-sharded, batch
dp-sharded, the sequence axis cp-sharded through every decoder layer's
zigzag ring attention (``examples/long_context/model.py``).

Data: a flat token stream (.npy / .bin int32 memmap, or synthetic when no
path is given) chunked into (seq_len + 1)-token windows; the loss is mean
next-token cross-entropy.

Usage::

    python -m multimodal_tpu.examples.long_context.train \
        --seq-len 8192 --cp 4 --dp 2 --steps 100 --tokens data/tokens.npy
"""

from __future__ import annotations

import argparse
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.examples.long_context.model import (
    LongContextLM,
    next_token_loss,
    packed_next_token_loss,
)
from multimodal_tpu.modules.layers.moe import moe_aux_loss
from multimodal_tpu.parallel.mesh import create_mesh
from multimodal_tpu.training.trainer import Trainer


class TokenWindowDataset:
    """(seq_len + 1)-token windows over a flat int32 token stream."""

    def __init__(self, tokens: np.ndarray, seq_len: int):
        self.tokens = tokens
        self.seq_len = seq_len
        self.n = max(0, (len(tokens) - 1) // seq_len)

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int) -> np.ndarray:
        start = i * self.seq_len
        return np.asarray(self.tokens[start:start + self.seq_len + 1], np.int32)


def token_batches(
    dataset: TokenWindowDataset, batch_size: int, seed: int = 0
) -> Iterator[dict]:
    rng = np.random.RandomState(seed)
    while True:
        idx = rng.randint(len(dataset), size=batch_size)
        yield {"tokens": np.stack([dataset[int(i)] for i in idx])}


def synthetic_tokens(vocab_size: int, n: int, seed: int = 0) -> np.ndarray:
    return np.random.RandomState(seed).randint(vocab_size, size=n).astype(np.int32)


def packed_document_batches(
    docs_path: Optional[str],
    vocab_size: int,
    seq_len: int,
    batch_size: int,
    seed: int = 0,
) -> Iterator[dict]:
    """Packed batches from a jsonl of per-document token-id lists (or a
    synthetic ragged document stream) via ``data/packing.pack_documents``;
    the extra +1 column keeps the recipe's shift-by-one loss layout."""
    import json

    from multimodal_tpu.data.packing import packed_batches

    def doc_stream():
        if docs_path:
            while True:  # infinite epochs over the file
                with open(docs_path) as f:
                    for line in f:
                        ids = json.loads(line)
                        if isinstance(ids, dict):
                            ids = ids["tokens"]
                        yield ids
        else:
            rng = np.random.RandomState(seed)
            while True:
                n = int(rng.randint(seq_len // 8, seq_len))
                yield rng.randint(1, vocab_size, size=n).astype(np.int32)

    for b in packed_batches(doc_stream(), seq_len + 1, batch_size):
        yield b


def build_trainer(
    model: LongContextLM,
    mesh,
    learning_rate: float = 3e-4,
    weight_decay: float = 0.1,
    checkpoint_dir: Optional[str] = None,
    log_dir: Optional[str] = None,
    strategy: str = "fsdp",
) -> Trainer:
    def loss_fn(params, batch, rng):
        inputs = batch["tokens"][:, :-1]
        targets = batch["tokens"][:, 1:]
        # packed batches (data/packing.py) carry segment_ids + per-document
        # positions: block-diagonal causal attention via the flash kernel's
        # O(S) segment path, loss masked at document boundaries
        packed = "segment_ids" in batch
        kwargs = {}
        if packed:
            kwargs = dict(
                segment_ids=batch["segment_ids"][:, :-1],
                positions=batch["positions"][:, :-1],
            )
        if model.moe_num_experts:
            logits, inter = model.apply(
                params, inputs, deterministic=False, rngs={"dropout": rng},
                mutable=["intermediates"], **kwargs,
            )
            aux = moe_aux_loss(inter["intermediates"])
        else:
            logits = model.apply(
                params, inputs, deterministic=False, rngs={"dropout": rng},
                **kwargs,
            )
            aux = 0.0
        if packed:
            loss = packed_next_token_loss(
                logits, targets, batch["segment_ids"]
            )
        else:
            loss = next_token_loss(logits, targets)
        metrics = {"perplexity": jnp.exp(loss)}
        if model.moe_num_experts:
            metrics["moe_aux"] = aux
        return loss + aux, metrics

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )
    return Trainer(
        loss_fn, tx, strategy=strategy, mesh=mesh,
        checkpoint_dir=checkpoint_dir, log_dir=log_dir,
        skip_nonfinite_updates=True,
    )


def build_pp_trainer(
    plm,
    mesh,
    learning_rate: float = 3e-4,
    weight_decay: float = 0.1,
    checkpoint_dir: Optional[str] = None,
    log_dir: Optional[str] = None,
) -> Trainer:
    """Trainer over a dp × pp mesh: the FULL model (embed + blocks + head)
    runs as a heterogeneous pipeline (``pipeline_model.PipelinedLM``), the
    stage-block params sharded P(None, 'pp') by the custom shard_fn."""

    def loss_fn(params, batch, rng):
        loss = plm.loss_fn(params, batch["tokens"])
        return loss, {"perplexity": jnp.exp(loss)}

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )
    return Trainer(
        loss_fn, tx, strategy="custom", shard_fn=plm.param_shardings,
        mesh=mesh, checkpoint_dir=checkpoint_dir, log_dir=log_dir,
        skip_nonfinite_updates=True,
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tokens", default=None, help=".npy/.bin int32 token stream")
    p.add_argument("--packed-docs", default=None,
                   help="jsonl of per-document token-id lists -> packed "
                        "training (segment-id attention, boundary-masked "
                        "loss); 'synthetic' for a generated ragged stream")
    p.add_argument("--vocab-size", type=int, default=32000)
    p.add_argument("--seq-len", type=int, default=8192)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--n-layer", type=int, default=12)
    p.add_argument("--d-model", type=int, default=768)
    p.add_argument("--n-head", type=int, default=12)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=-1)
    p.add_argument("--cp", type=int, default=1)
    p.add_argument("--ep", type=int, default=1)
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline stages (heterogeneous embed/blocks/head "
                        "pipeline; composes with --dp)")
    p.add_argument("--pp-virtual", type=int, default=1,
                   help="virtual chunks per pp device (interleaved circular "
                        "schedule; bubble (S-1)/(V*M+S-1))")
    p.add_argument("--pp-microbatches", type=int, default=0,
                   help="pipeline microbatches (default: = --pp)")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="0 = dense; N = MoE with N experts")
    p.add_argument("--moe-top-k", type=int, default=2)
    p.add_argument("--moe-interval", type=int, default=2)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--log-dir", default=None)
    args = p.parse_args(argv)

    mesh = create_mesh(dp=args.dp, fsdp=args.fsdp, tp=1, cp=args.cp,
                       ep=args.ep, pp=args.pp)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    if args.pp > 1:
        if args.cp > 1 or args.ep > 1 or args.packed_docs:
            raise SystemExit("--pp composes with --dp only (cp/ep/packed "
                             "ride the non-pipelined path)")
        from multimodal_tpu.examples.long_context.pipeline_model import (
            PipelinedLM,
        )

        plm = PipelinedLM(
            vocab_size=args.vocab_size, max_seq_len=args.seq_len,
            n_layer=args.n_layer, d_model=args.d_model, n_head=args.n_head,
            dim_feedforward=4 * args.d_model, mesh=mesh,
            n_virtual=args.pp_virtual,
            n_micro=args.pp_microbatches or args.pp,
            dtype=dtype,
        )
        if args.tokens:
            stream = np.load(args.tokens, mmap_mode="r") \
                if args.tokens.endswith(".npy") \
                else np.memmap(args.tokens, dtype=np.int32)
        else:
            stream = synthetic_tokens(
                args.vocab_size, args.batch_size * args.seq_len * 64
            )
        data = token_batches(
            TokenWindowDataset(stream, args.seq_len), args.batch_size
        )
        trainer = build_pp_trainer(
            plm, mesh, learning_rate=args.lr,
            checkpoint_dir=args.checkpoint_dir, log_dir=args.log_dir,
        )
        state = trainer.restore_or_init(plm.init(jax.random.PRNGKey(0)))
        state = trainer.fit(
            state, data, num_steps=args.steps,
            checkpoint_every=500 if args.checkpoint_dir else None,
        )
        return state
    model = LongContextLM(
        vocab_size=args.vocab_size,
        max_seq_len=args.seq_len,
        n_layer=args.n_layer,
        d_model=args.d_model,
        n_head=args.n_head,
        dim_feedforward=4 * args.d_model,
        cp_axis_name="cp" if args.cp > 1 else None,
        moe_num_experts=args.moe_experts or None,
        moe_top_k=args.moe_top_k,
        moe_interval=args.moe_interval,
        ep_axis_name="ep" if args.ep > 1 else None,
        remat=True,
        dtype=dtype,
    )

    if args.packed_docs:
        if args.cp > 1:
            raise SystemExit("--packed-docs does not compose with --cp yet")
        data = packed_document_batches(
            None if args.packed_docs == "synthetic" else args.packed_docs,
            args.vocab_size, args.seq_len, args.batch_size,
        )
    else:
        if args.tokens:
            stream = np.load(args.tokens, mmap_mode="r") if args.tokens.endswith(".npy") \
                else np.memmap(args.tokens, dtype=np.int32)
        else:
            stream = synthetic_tokens(args.vocab_size, args.batch_size * args.seq_len * 64)
        data = token_batches(
            TokenWindowDataset(stream, args.seq_len), args.batch_size
        )

    trainer = build_trainer(
        model, mesh, learning_rate=args.lr,
        checkpoint_dir=args.checkpoint_dir, log_dir=args.log_dir,
        # the rule-based strategy shards expert tensors over ep (and falls
        # back to fsdp for everything else); plain fsdp otherwise
        strategy="tp" if args.ep > 1 else "fsdp",
    )
    with jax.set_mesh(mesh):
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.seq_len), jnp.int32),
        )
    state = trainer.restore_or_init(params)
    state = trainer.fit(state, data, num_steps=args.steps,
                        checkpoint_every=500 if args.checkpoint_dir else None)
    return state


if __name__ == "__main__":
    main()
