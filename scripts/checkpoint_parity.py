"""One-command released-checkpoint parity harness for CLIP.

Reproduces the reference's published-checkpoint invariants
(``/root/reference/tests/models/clip/test_checkpoint.py:24-80``): with the
exact fixture inputs (``set_rng_seed(0)`` then ``randn`` images /
``randint`` text in fixture order), the released CLIP weights must produce
output-embedding means matching the published constants at atol 1e-4 —
ViT-B/16: 0.0030 / 0.0023, ViT-B/32: -0.0014 / -0.0041, ViT-L/14:
0.0006 / -0.0022.

This environment has no egress, so the script is built to run the moment a
checkpoint is reachable: URLs resolve through the cache-aware
``_PATH_MANAGER`` (pre-populate ``~/.cache/multimodal_tpu`` out-of-band or
let it download), conversion goes through the existing
``clip_params_from_torch`` / ``hf_clip_params_from_torch`` converters, and
in addition to the published means the JAX embeddings are cross-checked at
cosine >= 0.999 against the PyTorch reference model loaded from the same
state dict. The plumbing itself is exercised offline by
``tests/test_checkpoint_parity_harness.py`` with a locally-saved random-init
checkpoint.

Usage:
    python scripts/checkpoint_parity.py                      # b32 + b16
    python scripts/checkpoint_parity.py --variants vit_l14
    python scripts/checkpoint_parity.py --variants vit_b32 \
        --checkpoint /path/to/clip_vit_b32.pt                # local file
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
from typing import Any, Dict, Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

ATOL = 1e-4

# Published invariants: (image_mean, text_mean, embed_dim, image_size) per
# reference tests/models/clip/test_checkpoint.py:24-115.
PUBLISHED = {
    "vit_b16": (0.0030, 0.0023, 512, 224),
    "vit_b32": (-0.0014, -0.0041, 512, 224),
    "vit_l14": (0.0006, -0.0022, 768, 224),
}

_TORCH_BUILDERS = {  # reference-side builders, for the cosine cross-check
    "vit_b16": "clip_vit_b16",
    "vit_b32": "clip_vit_b32",
    "vit_l14": "clip_vit_l14",
}


def fixture_inputs():
    """Recreate the reference checkpoint-test fixture draws exactly.

    ``set_rng_seed(0)`` is ``torch.manual_seed(0); random.seed(0)``
    (reference tests/test_utils.py:62-65); the fixture then draws the four
    images and the text ids in declaration order
    (tests/models/clip/test_checkpoint.py:14-22).
    """
    import torch

    torch.manual_seed(0)
    random.seed(0)
    images = {s: torch.randn(1, 3, s, s) for s in (224, 288, 384, 448)}
    text = torch.randint(0, 49408, (1, 77))
    return images, text


def _jax_builder(variant: str):
    from multimodal_tpu.models.clip import model as clip_models

    return getattr(clip_models, f"clip_{variant}")


def run_variant(
    variant: str,
    checkpoint: Optional[str] = None,
    expected: Optional[tuple] = None,
    skip_torch_ref: bool = False,
    atol: float = ATOL,
) -> Dict[str, Any]:
    """Load one released checkpoint, assert published means + torch cosine.

    ``expected=None`` with a known variant uses the PUBLISHED table; pass
    ``expected=()`` to skip the mean assertion (offline smoke testing with a
    non-released checkpoint)."""
    import numpy as np
    import jax.numpy as jnp

    if expected is None:
        expected = PUBLISHED[variant]
    image_size = PUBLISHED[variant][3] if variant in PUBLISHED else 224

    images, text = fixture_inputs()
    image = images[image_size]

    model, params = _jax_builder(variant)(pretrained=checkpoint or True)
    image_jax = jnp.asarray(image.numpy().transpose(0, 2, 3, 1))  # NCHW->NHWC
    variables = params if "params" in params else {"params": params}
    out = model.apply(variables, image_jax, jnp.asarray(text.numpy()))
    a = np.asarray(out.embeddings_a, dtype=np.float64)
    b = np.asarray(out.embeddings_b, dtype=np.float64)

    result: Dict[str, Any] = {
        "variant": variant,
        "image_mean": float(a.mean()),
        "text_mean": float(b.mean()),
        "shape": list(a.shape),
        "ok": True,
        "failures": [],
    }

    if expected:
        exp_a, exp_b, dim = expected[0], expected[1], expected[2]
        if abs(a.mean() - exp_a) > atol:
            result["failures"].append(
                f"image mean {a.mean():.6f} != published {exp_a} (atol {atol})"
            )
        if abs(b.mean() - exp_b) > atol:
            result["failures"].append(
                f"text mean {b.mean():.6f} != published {exp_b} (atol {atol})"
            )
        if a.shape != (1, dim) or b.shape != (1, dim):
            result["failures"].append(
                f"shape {a.shape}/{b.shape} != (1, {dim})"
            )

    if not skip_torch_ref:
        cos_a, cos_b = _torch_cosine(variant, checkpoint, image, text, a, b)
        result["cosine_image"] = cos_a
        result["cosine_text"] = cos_b
        if cos_a < 0.999 or cos_b < 0.999:
            result["failures"].append(
                f"cosine vs torch reference below 0.999: {cos_a:.6f}/{cos_b:.6f}"
            )

    result["ok"] = not result["failures"]
    return result


def _torch_cosine(variant, checkpoint, image, text, a, b):
    """Run the PyTorch reference model off the same state dict and return
    cosines between its embeddings and the JAX ones."""
    import numpy as np
    import torch

    from tests.reference_compat import import_reference

    import_reference()
    from torchmultimodal.models.clip import model as torch_clip

    from multimodal_tpu.utils.pretrained import (
        CLIP_MODEL_MAPPING,
        load_torch_state_dict,
        resolve_checkpoint,
    )

    ckpt = resolve_checkpoint(checkpoint or True, CLIP_MODEL_MAPPING, variant)
    sd = load_torch_state_dict(ckpt)
    ref = getattr(torch_clip, _TORCH_BUILDERS[variant])(False)
    ref.load_state_dict({k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()})
    ref.eval()
    with torch.no_grad():
        ref_a, ref_b = ref(image, text)

    def cos(x, y):
        x = np.asarray(x, dtype=np.float64).ravel()
        y = np.asarray(y, dtype=np.float64).ravel()
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

    return cos(a, ref_a.numpy()), cos(b, ref_b.numpy())


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument(
        "--variants", nargs="+", default=["vit_b32", "vit_b16"],
        choices=sorted(PUBLISHED),
    )
    parser.add_argument(
        "--checkpoint", default=None,
        help="local path/URL override (single-variant runs only)",
    )
    parser.add_argument("--skip-torch-ref", action="store_true")
    parser.add_argument("--atol", type=float, default=ATOL)
    args = parser.parse_args(argv)

    if args.checkpoint and len(args.variants) != 1:
        parser.error("--checkpoint needs exactly one --variants entry")

    ok = True
    for variant in args.variants:
        try:
            res = run_variant(
                variant,
                checkpoint=args.checkpoint,
                skip_torch_ref=args.skip_torch_ref,
                atol=args.atol,
            )
        except Exception as exc:  # noqa: BLE001 — report and keep going
            res = {"variant": variant, "ok": False, "failures": [f"{type(exc).__name__}: {exc}"]}
        print(json.dumps(res))
        ok &= res["ok"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
