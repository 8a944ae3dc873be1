"""LoRA: init identity, gradient isolation, actual fine-tuning, folding."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_tpu.examples.long_context.model import LongContextLM, next_token_loss
from multimodal_tpu.training.lora import (
    LoRAFactor,
    lora_fold,
    lora_init,
    lora_merge,
    lora_param_count,
)


def _lm():
    model = LongContextLM(
        vocab_size=64, max_seq_len=32, n_layer=2, d_model=32, n_head=2,
        dim_feedforward=64,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return model, params


def test_lora_zero_init_is_identity():
    model, params = _lm()
    lora = lora_init(jax.random.PRNGKey(1), params, rank=4, min_size=1)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 64)
    np.testing.assert_allclose(
        np.asarray(model.apply(lora_merge(params, lora), tokens)),
        np.asarray(model.apply(params, tokens)),
        atol=1e-6,
    )


def test_lora_targets_filter_and_size():
    _model, params = _lm()
    lora_all = lora_init(jax.random.PRNGKey(1), params, rank=4, min_size=1)
    lora_attn = lora_init(
        jax.random.PRNGKey(1), params, rank=4, min_size=1,
        targets=("q_proj", "v_proj"),
    )
    def count_factors(tree):
        return len([
            x for x in jax.tree_util.tree_leaves(
                tree, is_leaf=lambda node: isinstance(node, LoRAFactor)
            ) if isinstance(x, LoRAFactor)
        ])

    n_all = count_factors(lora_all)
    n_attn = count_factors(lora_attn)
    assert n_attn == 4  # q/v in each of 2 layers
    assert n_all > n_attn
    base_count = sum(
        x.size for x in jax.tree_util.tree_leaves(params)
    )
    assert lora_param_count(lora_attn) < base_count / 10


def test_lora_finetune_trains_only_factors():
    model, params = _lm()
    lora = lora_init(jax.random.PRNGKey(1), params, rank=4, min_size=1)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (4, 9), 0, 64)

    def loss_fn(lora):
        logits = model.apply(lora_merge(params, lora), tokens[:, :-1])
        return next_token_loss(logits, tokens[:, 1:])

    tx = optax.adam(1e-2)
    opt_state = tx.init(lora)
    losses = []
    lora_state = lora
    for _ in range(20):
        loss, grads = jax.value_and_grad(loss_fn)(lora_state)
        # gradient isolation: every grad leaf is a LoRA factor array
        updates, opt_state = tx.update(grads, opt_state)
        lora_state = optax.apply_updates(lora_state, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses
    # base params untouched by construction (loss_fn closes over them)


def test_lora_fold_matches_merge():
    model, params = _lm()
    lora = lora_init(jax.random.PRNGKey(1), params, rank=4, min_size=1)
    # give b a nonzero value so folding is nontrivial
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if hasattr(x, "shape") else x, lora,
        is_leaf=lambda n: n is None,
    )
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, 64)
    folded = lora_fold(params, lora)
    np.testing.assert_allclose(
        np.asarray(model.apply(folded, tokens)),
        np.asarray(model.apply(lora_merge(params, lora), tokens)),
        atol=1e-6,
    )
    # folded trees serve directly through the engine
    from multimodal_tpu.serving import InferenceEngine, Request

    engine = InferenceEngine(
        model, folded, n_slots=1, max_len=32, cache_dtype=jnp.float32,
    )
    engine.submit(Request([1, 2, 3], max_new_tokens=3, request_id=0))
    outs = engine.run()
    toks = list(prompt_toks := [1, 2, 3])
    for _ in range(3):
        logits = model.apply(folded, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    assert outs[0].tokens == toks[len(prompt_toks):]


def test_lora_through_trainer():
    """The generic Trainer fine-tunes a LoRA tree as its trainable params
    (base weights frozen in the loss closure) over a dp mesh."""
    from multimodal_tpu.parallel.mesh import create_mesh
    from multimodal_tpu.training.trainer import Trainer

    model, params = _lm()
    lora = lora_init(jax.random.PRNGKey(1), params, rank=4, min_size=1)

    def loss_fn(lora_params, batch, rng):
        logits = model.apply(
            lora_merge(params, lora_params), batch["tokens"][:, :-1]
        )
        loss = next_token_loss(logits, batch["tokens"][:, 1:])
        return loss, {}

    tokens = np.asarray(
        jax.random.randint(jax.random.PRNGKey(0), (8, 9), 0, 64)
    )

    def eval_loss(lora_params):
        logits = model.apply(
            lora_merge(params, lora_params), jnp.asarray(tokens[:, :-1])
        )
        return float(next_token_loss(logits, jnp.asarray(tokens[:, 1:])))

    mesh = create_mesh(dp=8, fsdp=1)
    trainer = Trainer(loss_fn, optax.adam(1e-2), strategy="ddp", mesh=mesh)
    state = trainer.init_state(lora)
    before = eval_loss(lora)
    data = ({"tokens": tokens} for _ in range(15))
    state = trainer.fit(state, data, num_steps=15)
    after = eval_loss(jax.device_get(state["params"]))
    assert after < before * 0.9, (before, after)
