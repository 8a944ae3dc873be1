"""Omnivore data layer: RGB-D disparity, video clips, multi-task mixing
(reference examples/omnivore/data/)."""

import numpy as np

from multimodal_tpu.data.datasets import ListDataset
from multimodal_tpu.examples.omnivore.data import (
    SunRGBDDataModule,
    VideoClipDataModule,
    build_omnivore_loader,
    depth_to_disparity,
)


def test_depth_to_disparity():
    depth_mm = np.asarray([[1000.0, 2000.0]])  # 1m, 2m
    disp = depth_to_disparity(depth_mm, baseline=0.075, focal_length=518.857901)
    np.testing.assert_allclose(disp[0, 0] / disp[0, 1], 2.0, atol=1e-6)
    np.testing.assert_allclose(disp[0, 0], 0.075 * 518.857901, atol=1e-4)


def test_sunrgbd_datamodule():
    rng = np.random.RandomState(0)
    ds = ListDataset([
        {
            "image": rng.randint(0, 256, (16, 16, 3), np.uint8),
            "depth": rng.randint(500, 5000, (16, 16)).astype(np.float32),
            "label": i % 3,
        }
        for i in range(4)
    ])
    dm = SunRGBDDataModule(ds, batch_size=2, prefetch=0, shuffle=False)
    batch = next(iter(dm))
    assert batch["rgbd"].shape == (2, 16, 16, 4)
    assert batch["labels"].shape == (2,)
    # rgb channels normalized to [0,1]; disparity channel positive
    assert batch["rgbd"][..., :3].max() <= 1.0
    assert (batch["rgbd"][..., 3] > 0).all()


def test_video_clip_datamodule_and_mixing():
    rng = np.random.RandomState(0)
    video_ds = ListDataset([
        {"video": rng.randint(0, 256, (20, 8, 8, 3), np.uint8), "label": i}
        for i in range(4)
    ])
    image_ds = ListDataset([
        {"image": rng.randint(0, 256, (8, 8, 3), np.uint8), "label": i}
        for i in range(4)
    ])
    from multimodal_tpu.data.datamodules import ImageDataModule

    video_dm = VideoClipDataModule(
        video_ds, sequence_length=4, sample_every_n_frames=2,
        batch_size=2, prefetch=0,
    )
    batch = next(iter(video_dm))
    assert batch["video"].shape == (2, 4, 8, 8, 3)

    loader = build_omnivore_loader(
        {
            "image": ImageDataModule(image_ds, batch_size=2, prefetch=0),
            "video": video_dm,
            "rgbd_unused": ImageDataModule(image_ds, batch_size=2, prefetch=0),
        },
        sampling_factors=[1.0, 1.0, 0.0],  # zero factor -> dropped
    )
    seen = set()
    it = iter(loader)
    for _ in range(8):
        name, batch = next(it)
        seen.add(name)
    assert seen == {"image", "video"}
