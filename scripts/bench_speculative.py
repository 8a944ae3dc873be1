"""Speculative vs plain greedy decode latency on the real chip.

Single-stream (batch-1) decode is the latency-bound serving case: every
token costs one full weight read. A small draft proposes gamma tokens and
the 12L target verifies them in ONE forward, so accepted tokens divide the
target weight traffic. With an UNTRAINED random draft the acceptance rate
is near zero on real text — this bench uses the target itself as a
perfectly-correlated stand-in draft at 1/6 depth to show the mechanics and
upper bound; acceptance on trained model pairs lands between.

``--batch N`` additionally benches the CONTINUOUS-BATCHING engine with
in-engine speculative rounds (``InferenceEngine(draft_model=...)``) against
the plain engine at batch N — the round-4 in-engine path where speculative
and plain sampling requests share the slot pool losslessly.

Run: python scripts/bench_speculative.py [--tokens 128] [--gamma 4]
     [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.serving import InferenceEngine, Request
from multimodal_tpu.serving.speculative import SpeculativeDecoder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tokens", type=int, default=128)
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--vocab", type=int, default=32768)
    p.add_argument("--max-len", type=int, default=512)
    p.add_argument("--batch", type=int, default=0,
                   help="also bench the in-engine speculative path at this "
                        "batch width (0 = skip)")
    args = p.parse_args()

    def lm(n_layer, d_model, n_head):
        model = LongContextLM(
            vocab_size=args.vocab, max_seq_len=args.max_len,
            n_layer=n_layer, d_model=d_model, n_head=n_head,
            dim_feedforward=4 * d_model, dtype=jnp.bfloat16,
            param_dtype=jnp.bfloat16,
        )
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
        )
        return model, params

    target, t_params = lm(12, 768, 12)
    draft, d_params = lm(2, 256, 4)
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, args.vocab, 32).tolist()

    # plain greedy baseline through the engine (batch 1, multi-step)
    engine = InferenceEngine(
        target, t_params, n_slots=1, max_len=args.max_len, decode_steps=16,
    )
    engine.submit(Request(prompt, max_new_tokens=4))
    engine.run()  # compile
    engine.submit(Request(prompt, max_new_tokens=args.tokens))
    t0 = time.perf_counter()
    base = engine.run()[0].tokens
    base_dt = time.perf_counter() - t0
    print(f"plain greedy      : {args.tokens/base_dt:6.0f} tok/s "
          f"({base_dt/args.tokens*1e3:.1f} ms/token)")

    for name, (dm, dp) in {
        "draft=2L/256 (random)": (draft, d_params),
        "draft=target (upper bound)": (target, t_params),
    }.items():
        dec = SpeculativeDecoder(
            target, t_params, dm, dp, max_len=args.max_len, gamma=args.gamma,
        )
        # compile at the SAME max_new (it is a static arg of the fused loop)
        dec.generate(prompt, max_new_tokens=args.tokens)
        t0 = time.perf_counter()
        got = dec.generate(prompt, max_new_tokens=args.tokens)
        dt = time.perf_counter() - t0
        # on-chip bf16 logits of a RANDOM-init model sit in a narrow band, so
        # batched-verify vs step-by-step paths flip argmax ties; exact
        # equality is proven in fp32 (tests/serving/test_speculative.py)
        pref = 0
        for a, b in zip(got, base):
            if a != b:
                break
            pref += 1
        print(
            f"speculative {name}: {args.tokens/dt:6.0f} tok/s "
            f"({dt/args.tokens*1e3:.1f} ms/token) | {dec.rounds} target "
            f"forwards for {len(got)} tokens "
            f"({len(got)/dec.rounds:.2f} tok/forward) | "
            f"greedy-prefix match {pref}/{len(base)} (bf16 ties)"
        )

    if args.batch:
        # batch>1: in-engine speculative rounds vs the plain engine. The
        # draft-=target pairing keeps acceptance at 1.0 (the mechanics /
        # upper-bound measurement, same caveat as above).
        def run_engine(draft_pair, label):
            kw = {}
            if draft_pair is not None:
                kw = dict(draft_model=draft_pair[0],
                          draft_params=draft_pair[1], gamma=args.gamma)
            eng = InferenceEngine(
                target, t_params, n_slots=args.batch, max_len=args.max_len,
                decode_steps=4, **kw,
            )
            def submit_all(n_tok):
                for i in range(args.batch):
                    eng.submit(Request(
                        rng.integers(1, args.vocab, 32).tolist(),
                        max_new_tokens=n_tok, request_id=str(i),
                    ))
            submit_all(4)
            eng.run()  # compile
            submit_all(args.tokens)
            t0 = time.perf_counter()
            outs = eng.run()
            dt = time.perf_counter() - t0
            total = sum(len(o.tokens) for o in outs)
            extra = ""
            st = eng.stats()
            if "spec_acceptance" in st:
                extra = (f" | acceptance {st['spec_acceptance']:.2f}, "
                         f"{st['spec_tokens_per_round']:.2f} tok/round")
            print(f"{label}: {total/dt:6.0f} tok/s aggregate "
                  f"(batch {args.batch}){extra}")

        run_engine(None, "engine plain       ")
        run_engine((target, t_params), "engine speculative ")


if __name__ == "__main__":
    main()
