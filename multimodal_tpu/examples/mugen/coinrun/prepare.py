"""Offline dataset generator: coinrun game JSONs -> TPU input-pipeline files.

The reference renders frames lazily inside its torch Dataset
(``mugen_dataset.py:211``, re-drawing every sample with PIL each epoch).
The TPU-native pipeline instead renders ONCE offline — this CLI walks a
directory of replay JSONs and writes, per game:

  - ``frames/{id}.npy``: (T, res, res, 3) uint8 procedural-RGB clip (or
    (T, res, res) semantic maps with ``--mode smap``)
  - an auto-caption from ``text_desc.convert_game_to_text_desc``

plus a ``{split}.json`` release-metadata file in exactly the layout
``examples/mugen/data.py::MUGENDataModule`` consumes. After this, MUGEN
retrieval / text-to-video / AudioMAE recipes run end-to-end from raw game
JSONs with no reference tooling.

Usage::

    python -m multimodal_tpu.examples.mugen.coinrun.prepare \
        --json-dir games/ --out data/ --resolution 256 --split train
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List

import numpy as np

from multimodal_tpu.examples.mugen.coinrun.game import Game
from multimodal_tpu.examples.mugen.coinrun.render import render_game_video
from multimodal_tpu.examples.mugen.coinrun.text_desc import (
    convert_game_to_text_desc,
)


def prepare_dataset(
    json_dir: str,
    out_dir: str,
    split: str = "train",
    resolution: int = 256,
    mode: str = "rgb",
    alien_name: str = "Mugen",
) -> str:
    frames_dir = os.path.join(out_dir, "frames")
    os.makedirs(frames_dir, exist_ok=True)
    records: List[dict] = []
    for fname in sorted(os.listdir(json_dir)):
        if not fname.endswith(".json"):
            continue
        game = Game()
        game.load_json(os.path.join(json_dir, fname))
        vid = os.path.splitext(fname)[0]
        video = render_game_video(game, mode=mode, resolution=resolution,
                                  alien_name=alien_name)
        np.save(os.path.join(frames_dir, f"{vid}.npy"), video)
        text = convert_game_to_text_desc(game, alien_name=alien_name)
        records.append({
            "video": {
                "id": vid,
                "json_file": fname,
                "num_frames": len(game.frames),
            },
            "annotations": [{"text": text, "type": "auto"}],
        })
    meta_path = os.path.join(out_dir, f"{split}.json")
    with open(meta_path, "w") as f:
        json.dump({
            "metadata": {
                "renderer": f"multimodal_tpu procedural ({mode})",
                "resolution": resolution,
            },
            "data": records,
        }, f)
    return meta_path


def main(argv=None):
    p = argparse.ArgumentParser(description="Render coinrun JSONs into MUGEN datamodule files")
    p.add_argument("--json-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--mode", choices=("rgb", "smap"), default="rgb")
    p.add_argument("--alien-name", default="Mugen")
    args = p.parse_args(argv)
    meta = prepare_dataset(args.json_dir, args.out, split=args.split,
                           resolution=args.resolution, mode=args.mode,
                           alien_name=args.alien_name)
    print(f"wrote {meta}")


if __name__ == "__main__":
    main()
