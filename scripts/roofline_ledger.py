"""Per-op HBM byte ledger for the bench.py CLIP inference/train programs.

Compiles the exact forward (and optionally train) program bench.py times,
pulls the SCHEDULED optimized HLO off the compiler, and tallies each entry-
computation instruction's output bytes (post-fusion every entry instruction
is one HBM-materialized buffer; reads of an operand are the prior write
counted once more). Grouped by opcode and by the model-layer prefix of the
op_name metadata, this answers "where do the 37.8 GB/batch go, and which of
them are reducible" (VERDICT r3 next-round #3).

Cross-check: the aggregate must land near `cost_analysis()['bytes accessed']`
(XLA's own number, which also counts operand reads), and traffic / measured
step time must land near the effective GB/s BENCHMARKS.md reports.

Run (real chip): python scripts/roofline_ledger.py [--train] [--batch 512]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
INSTR_RE = re.compile(
    r"^\s+%?([\w.\-]+)\s*=\s*(\(?[\w\[\],\s{}:()\d/*#]+?\)?)\s+"
    r"([\w\-]+)\("
)
META_RE = re.compile(r'op_name="([^"]*)"')


def shape_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(type_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d.strip():
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def ledger_from_hlo(hlo: str):
    """Tally entry-computation instruction output bytes by opcode and by
    op_name group (the transformer-layer path prefix)."""
    lines = hlo.splitlines()
    in_entry = False
    by_op = collections.Counter()
    by_group = collections.Counter()
    rows = []
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ln.startswith("}"):
            break
        if not in_entry:
            continue
        m = INSTR_RE.match(ln)
        if not m:
            continue
        name, type_str, opcode = m.groups()
        if opcode in ("parameter", "constant", "get-tuple-element",
                      "tuple", "bitcast"):
            continue  # no fresh HBM traffic of their own
        nbytes = shape_bytes(type_str)
        if nbytes == 0:
            continue
        mm = META_RE.search(ln)
        op_name = mm.group(1) if mm else ""
        # group key: strip trailing op-specific parts, keep the layer path
        parts = [p for p in op_name.split("/") if p]
        group = "/".join(parts[:4]) if parts else f"<{opcode}>"
        by_op[opcode] += nbytes
        by_group[group] += nbytes
        rows.append((nbytes, opcode, op_name or name))
    return by_op, by_group, rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--train", action="store_true")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()

    from multimodal_tpu.models.clip.model import clip_vit_b32
    from multimodal_tpu.modules.losses.contrastive_loss_with_temperature import (
        contrastive_loss_with_temperature,
    )
    from multimodal_tpu.ops.image import fused_preprocess_for_encoder

    model = clip_vit_b32(dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
        jnp.zeros((1, 77), jnp.int32),
    )
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(
        rng.randint(0, 256, size=(args.batch, 256, 256, 3), dtype=np.uint8)
    )
    text = jnp.asarray(
        rng.randint(1, 49405, size=(args.batch, 77), dtype=np.int32)
    )

    if args.train:
        import optax
        opt = optax.adamw(1e-4)

        def loss_fn(params, images_u8, text):
            pixels = fused_preprocess_for_encoder(
                images_u8, 224, dtype=jnp.bfloat16
            )
            out = model.apply(params, pixels, text)
            return contrastive_loss_with_temperature(
                out.embeddings_a, out.embeddings_b, jnp.float32(4.6052)
            ).loss

        @jax.jit
        def prog(params, opt_state, images_u8, text):
            loss, grads = jax.value_and_grad(loss_fn)(params, images_u8, text)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        compiled = prog.lower(
            params, opt.init(params), images_u8, text
        ).compile()
    else:
        @jax.jit
        def prog(params, images_u8, text):
            pixels = fused_preprocess_for_encoder(
                images_u8, 224, dtype=jnp.bfloat16
            )
            out = model.apply(params, pixels, text)
            return jnp.sum(out.embeddings_a).astype(jnp.float32)

        compiled = prog.lower(params, images_u8, text).compile()

    hlo = compiled.as_text()
    by_op, by_group, rows = ledger_from_hlo(hlo)
    total_out = sum(by_op.values())

    xla_bytes = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        xla_bytes = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass

    print(f"batch={args.batch} mode={'train' if args.train else 'inference'}")
    print(f"entry-instruction OUTPUT bytes total: {total_out/1e9:.2f} GB")
    if xla_bytes:
        print(f"XLA cost_analysis 'bytes accessed' (reads+writes): "
              f"{xla_bytes/1e9:.2f} GB")
    print("\n== by opcode ==")
    for op, b in by_op.most_common(15):
        print(f"  {op:28s} {b/1e9:8.2f} GB  {100*b/total_out:5.1f}%")
    print("\n== by op_name group (layer path, top level) ==")
    for g, b in by_group.most_common(args.top):
        print(f"  {g:64s} {b/1e9:7.2f} GB")
    print("\n== largest single instructions ==")
    for b, op, name in sorted(rows, reverse=True)[: args.top]:
        print(f"  {b/1e6:9.1f} MB  {op:18s} {name[:90]}")


if __name__ == "__main__":
    main()
