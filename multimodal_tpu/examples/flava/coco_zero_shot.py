"""COCO-caption zero-shot cross-modal retrieval.

Parity with reference ``examples/flava/coco_zero_shot.py:1-101``: encode
every (image, first-caption) pair with the contrastive projections, build
the image/text similarity matrix, and report Recall@k in both directions
(image→text and text→image). TPU-native differences: the dataset is any
``load_dataset`` source (jsonl / arrow / imagefolder with captions) instead
of torchvision ``CocoCaptions``; encoding runs as jitted batches on device
with embeddings accumulated on host; and the recall computation reuses the
one-jit ``training/retrieval_eval.py`` (the reference re-derives top-k
membership per k, here the rank computation covers all ks at once).

Besides the standalone CLI, ``build_coco_eval`` returns a Trainer
``eval_fn`` so the FLAVA/CLIP pretraining recipes can track COCO retrieval
during training (``data.coco_path`` in the pretrain config).
"""

from __future__ import annotations

import argparse
from typing import Any, Callable, Dict, Iterator, Sequence

import jax.numpy as jnp
import numpy as np

from multimodal_tpu.training.retrieval_eval import retrieval_recall_at_k


def coco_caption_batches(
    dataset,
    image_transform: Callable,
    text_transform: Callable[[Sequence[str]], np.ndarray],
    batch_size: int = 64,
    image_key: str = "image",
    text_key: str = "text",
) -> Iterator[Dict[str, np.ndarray]]:
    """(image, first-caption) batches over a caption dataset — the
    reference's ``transform`` takes ``target[0]`` (coco_zero_shot.py:36)."""
    images, texts = [], []
    for i in range(len(dataset)):
        sample = dataset[i]
        caption = sample[text_key]
        if isinstance(caption, (list, tuple)):
            caption = caption[0]
        images.append(np.asarray(image_transform(sample[image_key])))
        texts.append(np.asarray(text_transform([caption]))[0])
        if len(images) == batch_size:
            yield {"image": np.stack(images), "text": np.stack(texts)}
            images, texts = [], []
    if images:
        yield {"image": np.stack(images), "text": np.stack(texts)}


def coco_retrieval_eval(
    encode_image: Callable[[jnp.ndarray], jnp.ndarray],
    encode_text: Callable[[jnp.ndarray], jnp.ndarray],
    batches: Iterator[Dict[str, np.ndarray]],
    ks: Sequence[int] = (1, 5, 10),
) -> Dict[str, float]:
    """Encode the dataset and compute Recall@k both directions.

    ``encode_*`` map a device batch to (contrastive-projected) embeddings;
    normalization happens inside the recall computation (reference
    coco_zero_shot.py:85-87).
    """
    image_embeds, text_embeds = [], []
    for batch in batches:
        image_embeds.append(np.asarray(
            encode_image(jnp.asarray(batch["image"])), np.float32
        ))
        text_embeds.append(np.asarray(
            encode_text(jnp.asarray(batch["text"])), np.float32
        ))
    img = jnp.asarray(np.concatenate(image_embeds))
    txt = jnp.asarray(np.concatenate(text_embeds))
    recalls = retrieval_recall_at_k(img, txt, ks=ks)
    out: Dict[str, float] = {}
    for k in ks:
        out[f"image_to_text_recall@{k}"] = recalls[f"a2b_recall_{k}"]
        out[f"text_to_image_recall@{k}"] = recalls[f"b2a_recall_{k}"]
    return out


def build_coco_eval(cfg: Dict[str, Any], model) -> Callable:
    """Trainer ``eval_fn`` evaluating COCO retrieval with the FLAVA
    contrastive projections (``model.encode_image/encode_text`` with
    ``projection=True`` — reference coco_zero_shot.py:76-79)."""
    from PIL import Image

    from multimodal_tpu.data.datasets import load_dataset
    from multimodal_tpu.examples.flava.pretrain import build_text_transform
    from multimodal_tpu.transforms.flava_transform import FLAVAImageTransform

    d, m = cfg["data"], cfg["model"]
    dataset = load_dataset(d["coco_path"], split="val")
    eval_transform = FLAVAImageTransform(
        is_train=False, encoder_input_size=m["image_size"],
        codebook_input_size=8, mask_num_patches=1, mask_window_size=1,
        mask_min_patches=1,
    )

    def image_transform(img):
        from multimodal_tpu.data.datamodules import _to_image

        img = _to_image(img)
        if isinstance(img, np.ndarray):
            img = Image.fromarray(np.asarray(img, np.uint8))
        return eval_transform.transform(img)["image"]

    tokenize = build_text_transform(cfg)

    def eval_fn(params) -> Dict[str, float]:
        # FLAVAForPreTraining.encode_* already return the contrastive-
        # projected embedding (projection=True inside, model.py:224-228)
        def encode_image(images):
            return model.apply(params, images, method=model.encode_image)

        def encode_text(tokens):
            return model.apply(params, tokens, method=model.encode_text)

        return coco_retrieval_eval(
            encode_image, encode_text,
            coco_caption_batches(
                dataset, image_transform, tokenize,
                batch_size=d["eval_batch_size"],
                image_key=d["image_key"], text_key=d["text_key"],
            ),
        )

    return eval_fn


def main(argv=None):
    from multimodal_tpu.examples.flava.pretrain import DEFAULTS, _build_model
    from multimodal_tpu.utils.config import build_config

    parser = argparse.ArgumentParser(description="COCO zero-shot retrieval")
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("overrides", nargs="*", help="dotlist overrides a.b=c")
    args = parser.parse_args(argv)
    cfg = build_config(args.config, args.overrides, defaults=DEFAULTS)
    if not cfg["data"].get("coco_path"):
        raise SystemExit("set data.coco_path=<caption dataset>")

    import jax

    from multimodal_tpu.examples.flava.pretrain import synthetic_batches

    model = _build_model(cfg)
    sample = next(synthetic_batches(cfg))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        image=jnp.asarray(sample["image"]),
        text=jnp.asarray(sample["text"]),
        text_masked=jnp.asarray(sample["text_masked"]),
        itm_labels=jnp.asarray(sample["itm_labels"]),
        mlm_labels=jnp.asarray(sample["mlm_labels"]),
    )
    ckpt = cfg["train"].get("checkpoint_dir")
    if ckpt:
        from multimodal_tpu.training.checkpoint import CheckpointManager

        params = CheckpointManager(ckpt).restore({"params": params})["params"]
    metrics = build_coco_eval(cfg, model)(params)
    for k, v in metrics.items():
        print(f"{k} {v:.4f}")
    return metrics


if __name__ == "__main__":
    main()
