"""MDETR loss parity vs the PyTorch reference (padded vs ragged formats)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from multimodal_tpu.modules.losses.mdetr import (
    box_losses,
    soft_token_prediction_loss,
)

from tests.reference_compat import import_reference

import_reference()

from torchmultimodal.modules.losses.mdetr import (  # noqa: E402
    box_losses as torch_box_losses,
    soft_token_prediction_loss as torch_soft_token_loss,
)


def _scenario(seed=0, b=2, q=5, n_tok=12, boxes_per_sample=(2, 1)):
    r = np.random.RandomState(seed)
    pred_logits = r.randn(b, q, n_tok).astype(np.float32)
    pred_boxes = (r.rand(b, q, 4) * 0.4 + 0.2).astype(np.float32)
    max_boxes = max(boxes_per_sample)

    # ragged reference format
    tgt_boxes_list = [
        torch.as_tensor((r.rand(n, 4) * 0.4 + 0.2).astype(np.float32))
        for n in boxes_per_sample
    ]
    pos_rows = []
    for n in boxes_per_sample:
        m = np.zeros((n, n_tok), np.float32)
        for i in range(n):
            cols = r.choice(n_tok - 1, 2, replace=False)
            m[i, cols] = 1.0
        pos_rows.append(m)
    positive_map_flat = np.concatenate(pos_rows, axis=0)
    indices = []
    for bi, n in enumerate(boxes_per_sample):
        qs = r.choice(q, n, replace=False)
        indices.append((torch.as_tensor(qs), torch.arange(n)))
    num_boxes = float(sum(boxes_per_sample))

    # padded jit-safe format
    assignment = np.full((b, max_boxes), -1, np.int32)
    valid = np.zeros((b, max_boxes), bool)
    pos_pad = np.zeros((b, max_boxes, n_tok), np.float32)
    tgt_pad = np.zeros((b, max_boxes, 4), np.float32)
    off = 0
    for bi, n in enumerate(boxes_per_sample):
        qs, ts = indices[bi]
        assignment[bi, :n][np.asarray(ts)] = np.asarray(qs)
        valid[bi, :n] = True
        pos_pad[bi, :n] = pos_rows[bi]
        tgt_pad[bi, :n] = tgt_boxes_list[bi].numpy()
        off += n
    return (pred_logits, pred_boxes, tgt_boxes_list, positive_map_flat,
            indices, num_boxes, assignment, valid, pos_pad, tgt_pad,
            list(boxes_per_sample))


def test_soft_token_loss_parity():
    (logits, _, _, pos_flat, indices, num_boxes,
     assignment, valid, pos_pad, _, n_boxes) = _scenario()
    with torch.no_grad():
        want = float(torch_soft_token_loss(
            torch.as_tensor(logits), n_boxes, torch.as_tensor(pos_flat),
            indices, num_boxes,
        ))
    got = float(soft_token_prediction_loss(
        jnp.asarray(logits), jnp.asarray(pos_pad), jnp.asarray(assignment),
        jnp.asarray(valid), num_boxes,
    ))
    assert got == pytest.approx(want, rel=1e-4), (got, want)


def test_box_losses_parity():
    (_, pred_boxes, tgt_list, _, indices, num_boxes,
     assignment, valid, _, tgt_pad, _) = _scenario()
    with torch.no_grad():
        want = torch_box_losses(
            torch.as_tensor(pred_boxes), tgt_list, indices, num_boxes
        )
    got = box_losses(
        jnp.asarray(pred_boxes), jnp.asarray(tgt_pad), jnp.asarray(assignment),
        jnp.asarray(valid), num_boxes,
    )
    assert float(got.l1_loss) == pytest.approx(float(want.l1_loss), rel=1e-4)
    assert float(got.giou_loss) == pytest.approx(float(want.giou_loss), rel=1e-4)
