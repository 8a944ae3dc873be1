"""ALBEF recipe schedules vs torch's CosineAnnealingWarmRestarts."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_tpu.examples.albef.recipes import albef_alpha_schedule, albef_cosine_lr


def test_alpha_ramp():
    assert float(albef_alpha_schedule(0, 0, 100)) == 0.0
    assert abs(float(albef_alpha_schedule(0, 50, 100)) - 0.2) < 1e-6
    assert float(albef_alpha_schedule(0, 100, 100)) == pytest.approx(0.4)
    assert float(albef_alpha_schedule(3, 0, 100)) == pytest.approx(0.4)


def test_lr_matches_torch_scheduler():
    lr0, min_lr, max_epochs, warmup_steps, step_size = 1e-5, 1e-6, 6, 2, 10
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr0)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=max_epochs, eta_min=min_lr
    )
    warmup_iterations = warmup_steps * step_size
    batches_per_epoch = 35

    for epoch in range(4):
        if epoch > 0:
            sched.step(epoch + warmup_steps)
        for batch in range(batches_per_epoch):
            if epoch == 0 and batch % step_size == 0 and batch <= warmup_iterations:
                sched.step(batch // step_size)
            want = opt.param_groups[0]["lr"]
            got = float(albef_cosine_lr(
                epoch, batch, lr=lr0, min_lr=min_lr, max_epochs=max_epochs,
                warmup_steps=warmup_steps, step_size=step_size,
            ))
            assert got == pytest.approx(want, rel=1e-6), (epoch, batch)
