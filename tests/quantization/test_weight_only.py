"""Weight-only int8 PTQ: round-trip accuracy, tree structure, model-level
cosine, and serving-engine integration."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_tpu.examples.long_context.model import LongContextLM
from multimodal_tpu.models.clip.image_encoder import CLIPViTEncoder
from multimodal_tpu.quantization import (
    QuantizedLeaf,
    QuantizedModule,
    dequantize_tree,
    quantization_error,
    quantize_tree,
    size_bytes,
)


def _leaves_by_kind(qparams):
    quantized, dense = [], []

    def walk(node, path=""):
        if isinstance(node, QuantizedLeaf):
            quantized.append(path)
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}/{k}")
        else:
            dense.append(path)

    walk(qparams)
    return quantized, dense


def test_roundtrip_error_small():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128))
    params = {"params": {"dense": {"kernel": w, "bias": jnp.zeros(128)}}}
    q = quantize_tree(params, min_size=1)
    errs = quantization_error(params, q)
    assert list(errs) == ["/params/dense/kernel"]
    assert errs["/params/dense/kernel"] < 0.02
    deq = dequantize_tree(q)
    assert deq["params"]["dense"]["kernel"].dtype == w.dtype
    np.testing.assert_allclose(
        np.asarray(deq["params"]["dense"]["kernel"]), np.asarray(w),
        atol=float(jnp.abs(w).max()) / 100,
    )


def test_selective_quantization_and_size():
    model = LongContextLM(
        vocab_size=512, max_seq_len=32, n_layer=2, d_model=64, n_head=2,
        dim_feedforward=128,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    q = quantize_tree(params, min_size=4096)
    quantized, dense = _leaves_by_kind(q)
    # token/pos embeddings + attention/MLP/lm_head kernels went int8
    assert any("tok_embed" in p for p in quantized)
    assert any("q_proj/kernel" in p for p in quantized)
    # norms and biases stayed dense
    assert all("layernorm" not in p or "scale" not in p for p in quantized)
    assert any("bias" in p for p in dense)
    # big win on bytes: the fp32 tree is ~4x the int8(+scales) tree
    ratio = size_bytes(params) / size_bytes(q)
    assert ratio > 3.0, ratio


def test_quantized_tree_jits_and_donates():
    """QuantizedLeaf trees pass through jit boundaries (static dtype field)."""
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    q = quantize_tree({"k": {"kernel": w}}, min_size=1)

    @jax.jit
    def f(qp, x):
        return x @ dequantize_tree(qp)["k"]["kernel"]

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 128))
    got = np.asarray(f(q, x))
    want = np.asarray(x @ w)
    # per-element quantized-matmul error ~ sqrt(K) * step/sqrt(12); bound by
    # a small fraction of the output scale rather than per-element rtol
    assert np.abs(got - want).max() < 0.02 * np.abs(want).max()


def test_clip_tower_cosine_after_quantization():
    encoder = CLIPViTEncoder(
        image_size=32, patch_size=8, layers=3, heads=4, width=64,
        embedding_dim=32,
    )
    images = jax.random.normal(jax.random.PRNGKey(5), (4, 32, 32, 3))
    params = encoder.init(jax.random.PRNGKey(6), images)
    dense_emb = np.asarray(encoder.apply(params, images))

    qparams = quantize_tree(params, min_size=1024)
    quantized, _ = _leaves_by_kind(qparams)
    assert len(quantized) >= 10  # the transformer actually got quantized
    q_emb = np.asarray(
        jax.jit(lambda qp, x: encoder.apply(dequantize_tree(qp), x))(
            qparams, images
        )
    )
    cos = np.sum(dense_emb * q_emb, axis=-1) / (
        np.linalg.norm(dense_emb, axis=-1) * np.linalg.norm(q_emb, axis=-1)
    )
    assert cos.min() >= 0.999, cos


def test_quantized_module_drives_serving_engine():
    from multimodal_tpu.serving import InferenceEngine, Request

    model = LongContextLM(
        vocab_size=50, max_seq_len=32, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    qparams = quantize_tree(params, min_size=256)

    engine = InferenceEngine(
        QuantizedModule(model), qparams, n_slots=2, max_len=32,
        cache_dtype=jnp.float32,
    )
    engine.submit(Request([1, 2, 3], max_new_tokens=5, request_id=0))
    engine.submit(Request([4, 5], max_new_tokens=5, request_id=1))
    outs = {o.request_id: o for o in engine.run()}

    # reference: greedy loop over the SAME dequantized weights
    deq = dequantize_tree(qparams)
    for rid, prompt in [(0, [1, 2, 3]), (1, [4, 5])]:
        toks = list(prompt)
        want = []
        for _ in range(5):
            logits = model.apply(deq, jnp.asarray([toks], jnp.int32))
            nxt = int(jnp.argmax(logits[0, -1]))
            want.append(nxt)
            toks.append(nxt)
        assert outs[rid].tokens == want
