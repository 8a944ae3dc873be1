"""Coinrun frame renderer — numpy rect compositor.

Parity surface: reference ``examples/mugen/data/coinrun/construct_from_json.py``
(``draw_game_frame``:459, semantic color map:32, camera math:480-530, tile /
monster / agent / shield placement:545-756). The reference composites PNG
art assets with PIL; those assets are not redistributable, so this
implementation renders procedurally with numpy rect fills:

  - **semantic-map mode** (``mode="smap"``): a (res, res) uint8 label image
    using the reference's exact semantic label assignment
    (``SEMANTIC_COLOR_MAP``) and placement geometry — the mode the MUGEN
    baselines train segmentation/worldmodels on (reference
    ``gen_original=False`` with ``bbox_smap_for_agent/monsters=True``,
    i.e. box masks; per-pixel alpha masks require the art).
  - **procedural RGB mode** (``mode="rgb"``): each entity class filled with
    a distinct palette color over a vertical sky gradient — same geometry,
    art-free stand-in for ``gen_original=True`` (documented divergence).

Geometry kept exactly: video-center camera with dx from agent x, the
per-zoom dy ratio table, the radius-windowed maze scan, eaten-coin
elision, monster death shrinkage, the 2:1 agent aspect, and the power-up
shield bubble offsets.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np

from multimodal_tpu.examples.mugen.coinrun.game import (
    COIN,
    CRATE_DOUBLE,
    CRATE_NORMAL,
    CRATE_SINGLE,
    CRATE_WARNING,
    GEM,
    LADDER,
    LAVA_MIDDLE,
    LAVA_SURFACE,
    MONSTER_DEATH_ANIM_LENGTH,
    SPACE,
    WALL_CLIFF_LEFT,
    WALL_CLIFF_RIGHT,
    WALL_MIDDLE,
    WALL_SURFACE,
    Game,
)

# reference construct_from_json.py:32-105 (max_label=21 variant keeps every
# class distinct; 18 collapses gem/barnacle/frog/shield into background)
def semantic_color_map(max_label: int = 21) -> Dict[str, object]:
    if max_label not in (18, 21, 22):
        raise ValueError(f"max_label {max_label} is not supported")
    world = {
        WALL_MIDDLE: 3, WALL_SURFACE: 4, WALL_CLIFF_LEFT: 5,
        WALL_CLIFF_RIGHT: 6,
        COIN: 17 if max_label == 18 else 19,
        GEM: 0 if max_label == 18 else 20,
        CRATE_NORMAL: 8, CRATE_DOUBLE: 8, CRATE_SINGLE: 8, CRATE_WARNING: 8,
        LAVA_MIDDLE: 1, LAVA_SURFACE: 2, LADDER: 7,
    }
    monsters = {
        "sawHalf": 16, "bee": 15, "slimeBlock": 14, "slimeBlue": 13,
        "mouse": 12, "snail": 11, "ladybug": 10, "wormPink": 9,
        "barnacle": 0 if max_label == 18 else 17,
        "frog": 0 if max_label == 18 else 18,
    }
    return {
        "background": 0,
        "alien": max_label,
        "world": world,
        "monster": monsters,
        "shield": 0 if max_label == 18 else 21,
    }


# procedural RGB palette: one visually-distinct color per semantic label
_PALETTE = np.asarray([
    [135, 206, 235],  # 0 background (sky)
    [255, 69, 0],     # 1 lava middle
    [255, 140, 0],    # 2 lava surface
    [101, 67, 33],    # 3 wall middle
    [34, 139, 34],    # 4 wall surface
    [85, 107, 47],    # 5 cliff left
    [107, 142, 35],   # 6 cliff right
    [160, 82, 45],    # 7 ladder
    [205, 133, 63],   # 8 crate
    [255, 105, 180],  # 9 wormPink
    [220, 20, 60],    # 10 ladybug
    [128, 0, 128],    # 11 snail
    [128, 128, 128],  # 12 mouse
    [30, 144, 255],   # 13 slimeBlue
    [0, 191, 255],    # 14 slimeBlock
    [255, 215, 0],    # 15 bee
    [192, 192, 192],  # 16 sawHalf
    [72, 61, 139],    # 17 barnacle
    [0, 128, 0],      # 18 frog
    [255, 223, 0],    # 19 coin
    [255, 0, 0],      # 20 gem
    [255, 255, 255],  # 21 alien (Mugen)
    [173, 216, 230],  # 22 shield bubble
], np.uint8)


def _dy_ratio(zoom: float) -> float:
    # per-zoom camera lift (reference construct_from_json.py:497-507)
    table = {5.5: 5.0, 4.3: 6.5, 5.0: 5.5, 6.0: 4.5}
    if zoom not in table:
        raise NotImplementedError(f"zoom level {zoom} is not supported")
    return table[zoom]


def _fill(img: np.ndarray, rect, value) -> None:
    """Clip an xywh rect to the image and fill (the numpy analog of the
    reference's PIL paste-with-box)."""
    x0, y0, w, h = rect
    x1, y1 = x0 + w, y0 + h
    res_h, res_w = img.shape[:2]
    x0, y0 = max(int(x0), 0), max(int(y0), 0)
    x1, y1 = min(int(x1), res_w), min(int(y1), res_h)
    if x0 >= x1 or y0 >= y1:
        return
    img[y0:y1, x0:x1] = value


def render_game_frame(
    game: Game,
    frame_id: int,
    *,
    mode: str = "smap",
    max_label: int = 21,
    alien_name: str = "Mugen",
    resolution: Optional[int] = None,
) -> np.ndarray:
    """Render one frame: (res, res) uint8 labels (``mode="smap"``) or
    (res, res, 3) uint8 procedural RGB (``mode="rgb"``)."""
    res = resolution if resolution is not None else game.video_res
    # kx/ky: pixels per maze cell — resolution * zoom / maze_w, matching the
    # reference dataset generator's asset grid size (mugen_dataset.py passes
    # kx = ky = resolution * zoom / maze_w into draw_game_frame)
    kx = ky = res * game.zoom / game.maze_w

    smap = semantic_color_map(max_label)
    labels = np.zeros((res, res), np.uint8)

    video_center = (res - 1) // 2
    frame = game.frames[frame_id]
    dx = -frame.agent.x * kx + video_center - 0.5 * kx
    dy = -video_center + _dy_ratio(game.zoom) * ky
    win_h = res

    # radius-windowed maze scan around the agent (reference :531-541)
    radius = int(1 + game.maze_w / game.zoom)
    ix, iy = int(frame.agent.x + 0.5), int(frame.agent.y + 0.5)
    eaten = {tuple(c) for c in frame.coins_eaten}
    for y in range(max(iy - radius, 0), min(iy + radius + 1, game.maze_h)):
        row = game.maze[y]
        for x in range(max(ix - radius, 0), min(ix + radius + 1, game.maze_w)):
            cell = row[x]
            if cell == SPACE or (x, y) in eaten:
                continue
            label = smap["world"].get(cell)
            if label is None:
                continue
            rect = (
                math.floor(kx * x + dx - 0.1),
                math.floor(win_h - ky * y + dy - 0.1),
                math.ceil(kx + 0.7),
                math.ceil(ky + 0.7),
            )
            _fill(labels, rect, label)

    # monsters (death shrinks the box from the top, reference :634-661)
    for m in frame.monsters:
        if m.is_dead:
            dying = max(0, m.monster_dying_frame_cnt)
            shrink = (MONSTER_DEATH_ANIM_LENGTH - dying) * 0.8 \
                / MONSTER_DEATH_ANIM_LENGTH
        else:
            shrink = 0.0
        rect = (
            math.floor(kx * m.x + dx),
            math.floor(win_h - ky * m.y + dy + ky * shrink),
            math.ceil(kx),
            math.ceil(ky * (1 - shrink)),
        )
        name = game.flattened_monster_names[m.theme]
        _fill(labels, rect, smap["monster"].get(name, 0))

    # agent (2:1 aspect; drawn last so it fronts monsters, reference :678-698)
    agent_rect = (
        math.floor(kx * frame.agent.x + dx),
        math.floor(win_h - ky * (frame.agent.y + 1) + dy),
        math.ceil(kx),
        math.ceil(2 * ky),
    )
    _fill(labels, agent_rect, smap["alien"])

    # power-up shield bubble (reference :727-752)
    if frame.agent.power_up_mode and smap["shield"] != 0:
        shield_rect = [
            math.floor(kx * frame.agent.x + dx - 7 * res / 1024),
            math.floor(win_h - ky * (frame.agent.y + 1) + dy + 8 * res / 1024),
            math.ceil(kx * 1.15),
            math.ceil(ky * 2.1),
        ]
        if frame.agent.pose == "duck":
            shield_rect[1] += math.floor(8 * res / 1024)
        # bubble outline only (a filled bubble would erase the agent):
        t = max(1, int(2 * res / 256))
        x0, y0, w, h = shield_rect
        _fill(labels, (x0, y0, w, t), smap["shield"])
        _fill(labels, (x0, y0 + h - t, w, t), smap["shield"])
        _fill(labels, (x0, y0, t, h), smap["shield"])
        _fill(labels, (x0 + w - t, y0, t, h), smap["shield"])

    if mode == "smap":
        return labels
    if mode != "rgb":
        raise ValueError(f"unknown render mode {mode}")
    return _PALETTE[np.minimum(labels, len(_PALETTE) - 1)]


def render_game_video(
    game: Game,
    start: int = 0,
    end: Optional[int] = None,
    *,
    mode: str = "rgb",
    resolution: int = 256,
    **kwargs,
) -> np.ndarray:
    """Render frames [start, end) as (T, res, res[, 3]) uint8."""
    end = len(game.frames) if end is None else min(end, len(game.frames))
    return np.stack([
        render_game_frame(game, i, mode=mode, resolution=resolution, **kwargs)
        for i in range(start, end)
    ])
