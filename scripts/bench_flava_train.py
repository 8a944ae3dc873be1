"""FLAVA pretraining benchmark through the REAL stack on the chip.

The reference's native-trainer flagship is FLAVA pretraining
(``examples/flava/native/train.py``). This benchmark runs ≥50 steady-state
``Trainer.fit`` steps with the full 6-loss objective fed by the real data
layer (on-disk jsonl -> VLDataModule: two-way FLAVA image transform, MLM
masking, ITM negatives) and reports:

  - pipeline_items_per_sec: steady-state throughput through data + device
  - device_step_ms / device_items_per_sec: jitted-step time with the input
    pipeline taken out (same batch re-fed), i.e. the chip-only rate
  - train_mfu_analytic: analytic matmul FLOPs for the pretrain step
    (image/text/masked-text towers + mm encoder + MLM/MIM heads + dVAE,
    3x forward for fwd+bwd) over the device step time
  - host_occupancy: device_step_time / pipeline_step_time — 1.0 means the
    host pipeline keeps the chip fully fed; this box has ONE core, so the
    measured occupancy is the honest single-core number (the pipeline
    thread-pools scale with cores on real hosts)

Usage: python scripts/bench_flava_train.py [--steps 50] [--batch 8]
       [--size debug|base]
"""

import argparse
import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16_FLOPS = 197e12


def make_dataset(root: str, n: int = 64) -> str:
    from PIL import Image

    rng = np.random.RandomState(0)
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    path = os.path.join(root, "train.jsonl")
    words = ["red", "dog", "jumps", "over", "blue", "car", "near", "tree",
             "tall", "house", "small", "bird", "green", "field", "runs"]
    with open(path, "w") as f:
        for i in range(n):
            p = os.path.join(img_dir, f"{i}.jpg")
            Image.fromarray(
                rng.randint(0, 256, (480, 640, 3), dtype=np.uint8)
            ).save(p, quality=90)
            caption = " ".join(rng.choice(words, size=12))
            f.write(json.dumps({"image": p, "text": caption}) + "\n")
    return path


def tower_flops(d, ff, layers, tokens):
    return layers * (2.0 * 4 * d * d * tokens + 2.0 * 2 * tokens * tokens * d
                     + 2.0 * 2 * d * ff * tokens)


def flava_fwd_flops_per_item(image_size=224, patch=16, vocab=30522,
                             size="base"):
    """Analytic matmul FLOPs for ONE sample through the pretrain forward:
    image tower (197 tok), global + masked text towers (77 each), mm
    encoder over 274+2 tok, MLM/MIM/ITM/contrastive heads, dVAE encoder.
    Tower dims come from FLAVA_CONFIGS[size] (library defaults for base)."""
    from multimodal_tpu.models.flava.configs import FLAVA_CONFIGS

    c = FLAVA_CONFIGS[size]
    d_i = c.get("image_hidden_size", 768)
    ff_i = c.get("image_intermediate_size", 3072)
    l_i = c.get("image_num_hidden_layers", 12)
    d_t = c.get("text_hidden_size", 768)
    ff_t = c.get("text_intermediate_size", 3072)
    l_t = c.get("text_num_hidden_layers", 12)
    d_m = c.get("multimodal_hidden_size", 768)
    ff_m = c.get("multimodal_intermediate_size", 3072)
    l_m = c.get("multimodal_num_hidden_layers", 6)

    n_img = (image_size // patch) ** 2 + 1          # 197
    n_txt = 77
    img = 2.0 * (patch * patch * 3 * d_i) * (n_img - 1) \
        + tower_flops(d_i, ff_i, l_i, n_img)
    txt = tower_flops(d_t, ff_t, l_t, n_txt)
    masked_txt = txt
    mm_tokens = n_img + n_txt + 2
    mm = tower_flops(d_m, ff_m, l_m, mm_tokens) \
        + 2.0 * d_i * d_m * n_img + 2.0 * d_t * d_m * n_txt   # -> mm proj
    mlm_head = 2.0 * (d_t * d_t + d_t * vocab) * n_txt
    mim_head = 2.0 * (d_m * d_m + d_m * 8192) * (n_img - 1)
    heads = 2.0 * d_m * d_m * 6                      # ITM/contrastive/pool
    # dVAE encoder: 7-conv tower on 112x112 (dominated by first convs)
    dvae = 2.0 * 1.1e9
    return img + txt + masked_txt + mm + mlm_head + mim_head + heads + dvae


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", default="base")
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--pure-bf16", action="store_true",
                    help="bf16 params + AnyPrecision Kahan optimizer "
                         "(8 bytes/param state; how 900m fits one v5e)")
    ap.add_argument("--scan-layers", action="store_true",
                    help="nn.scan stacked towers (depth-independent compile)")
    args = ap.parse_args()

    from multimodal_tpu.examples.flava.pretrain import (
        DEFAULTS,
        build_trainer_and_state,
        real_batches,
    )
    from multimodal_tpu.utils.config import build_config

    tmp = tempfile.mkdtemp(prefix="flava_bench_")
    data_path = make_dataset(tmp, n=args.samples)
    overrides = [
        f"data.path={data_path}",
        f"data.batch_size={args.batch}",
        "train.steps=1",
        "train.log_interval=1000000",
        f"model.size={args.size}",
    ]
    if args.pure_bf16:
        overrides.append("train.pure_bf16=true")
    cfg = build_config(None, overrides, defaults=DEFAULTS)
    if args.scan_layers:
        # scan + remat pair for training: without remat, nn.scan saves every
        # block's intermediates STACKED over layers (24x per-layer attention
        # probs OOM'd a v5e at 900m); with nothing_saveable remat only the
        # (n_layer, b, s, h) carry survives to the backward.
        cfg["model"]["overrides"]["scan_layers"] = True
        cfg["model"]["overrides"]["remat"] = True
    trainer, state = build_trainer_and_state(cfg)
    n_params = sum(int(math.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state["params"]))
    print(f"model={args.size} params={n_params/1e6:.1f}M batch={args.batch}",
          flush=True)

    # ---- full pipeline: warmup (compile) + timed steady-state steps
    batches = real_batches(cfg)
    state = trainer.fit(state, batches, num_steps=args.warmup)
    t0 = time.perf_counter()
    state = trainer.fit(state, batches, num_steps=args.steps)
    jax.block_until_ready(state["params"])
    pipeline_dt = (time.perf_counter() - t0) / args.steps
    pipeline_ips = args.batch / pipeline_dt

    # ---- device-only: re-feed one already-sharded batch. Per-step host
    # pulls + median: the remote runtime occasionally stalls ~minutes on a
    # first execution (observed repeatedly), which would poison a
    # single-pull chained timing; the median of individually-pulled steps
    # after two discarded warm steps is robust to it.
    batch = next(iter(real_batches(cfg)))
    device_batch = trainer.shard_batch(batch)
    if trainer._step_fn is None:
        trainer._step_fn = trainer._build_step()
    rng = jax.random.PRNGKey(0)
    times = []
    with jax.set_mesh(trainer.mesh):
        for i in range(12):
            rng, sub = jax.random.split(rng)
            t0 = time.perf_counter()
            state, metrics = trainer._step_fn(state, device_batch, sub)
            float(metrics["loss"])
            times.append(time.perf_counter() - t0)
    device_dt = float(np.median(times[2:]))
    device_ips = args.batch / device_dt

    fwd = flava_fwd_flops_per_item(cfg["model"]["image_size"],
                                   cfg["model"]["patch_size"],
                                   size=args.size)
    mfu = 3.0 * fwd * args.batch / device_dt / V5E_PEAK_BF16_FLOPS

    print(json.dumps({
        "metric": "flava_pretrain_train_step",
        "model": args.size,
        "params_m": round(n_params / 1e6, 1),
        "batch": args.batch,
        "pipeline_items_per_sec": round(pipeline_ips, 2),
        "pipeline_step_ms": round(pipeline_dt * 1e3, 1),
        "device_items_per_sec": round(device_ips, 2),
        "device_step_ms": round(device_dt * 1e3, 1),
        "train_mfu_analytic": round(mfu, 4),
        "fwd_gflop_per_item_analytic": round(fwd / 1e9, 2),
        "host_occupancy": round(device_dt / pipeline_dt, 3),
        "host_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
