"""Coinrun game engine (round 3 — closes the one consciously-dropped
reference subsystem): JSON data model, auto-captioning, procedural
renderer, and the prepare CLI feeding MUGENDataModule end-to-end."""

import json

import numpy as np

from multimodal_tpu.examples.mugen.coinrun.game import Game
from multimodal_tpu.examples.mugen.coinrun.render import (
    render_game_frame,
    render_game_video,
    semantic_color_map,
)
from multimodal_tpu.examples.mugen.coinrun.text_desc import (
    convert_game_to_text_desc,
)


def _make_game():
    """Scripted replay: walk right (8f) -> level jump collecting a coin
    (7f) -> stand (7f) on a flat 'S' floor with one coin at (10, 1)."""
    maze = ["S" * 64] + ["." * 64 for _ in range(12)]
    maze[1] = maze[1][:10] + "1" + maze[1][11:]

    frames = []
    t = 0

    def frame(x, y, vx, vy, coins=()):
        nonlocal t
        f = {
            "frame_id": t,
            "state_time": t,
            "coins_eaten": [list(c) for c in coins],
            "agent": {"x": x, "y": y, "vx": vx, "vy": vy, "time_alive": t},
            "monsters": [],
        }
        t += 1
        return f

    for i in range(8):                      # walk right: x 5 -> 8.5
        frames.append(frame(5 + 0.5 * i, 1.0, 0.5, 0.0))
    xs = [9.0, 9.4, 9.8, 10.2, 10.6, 11.0]  # jump arc over the coin
    ys = [1.8, 2.4, 2.6, 2.4, 1.8, 1.0]
    for i in range(6):
        coins = [(10, 1)] if i >= 3 else []
        frames.append(frame(xs[i], ys[i], 0.4, 0.8 if i < 5 else 0.5,
                            coins))
    for _ in range(7):                      # stand
        frames.append(frame(11.0, 1.0, 0.0, 0.0, [(10, 1)]))

    return Game(
        maze=maze, frames=frames, zoom=5.5, maze_w=64, maze_h=13,
        video_res=1024,
        monster_names={"ground": ["snail"], "walking": [], "flying": ["bee"]},
    )


def test_game_json_roundtrip(tmp_path):
    game = _make_game()
    path = tmp_path / "g.json"
    game.save_json(str(path))
    loaded = Game()
    loaded.load_json(str(path))
    assert len(loaded.frames) == len(game.frames)
    # pose derivation from dynamics (reference game.py:189-207)
    assert loaded.frames[0].agent.pose in ("walk1", "walk2")
    assert loaded.frames[9].agent.pose == "jump"
    assert loaded.frames[-1].agent.pose == "stand"
    # walk1/walk2 alternate with anim_freq=5
    assert loaded.frames[0].agent.walk1_mode != loaded.frames[5].agent.walk1_mode
    # flatten order: ground, walking, flying (the theme index space)
    assert loaded.flattened_monster_names == ["snail", "bee"]
    # eaten coin restored into the maze on load (game.py:92-104): the coin
    # was never removed from this maze, so it must still be there
    assert loaded.maze[1][10] == "1"


def test_auto_caption_matches_reference_templates():
    game = _make_game()
    text = convert_game_to_text_desc(game)
    assert text == (
        "Mugen walks to the right, and jumps to the right and collects"
        " a coin, and walks a bit"
    ), text


def test_semantic_map_rendering():
    game = _make_game()
    labels = render_game_frame(game, 0, mode="smap", resolution=128)
    assert labels.shape == (128, 128)
    present = set(np.unique(labels))
    smap = semantic_color_map(21)
    # background, wall surface, the coin, and the agent
    assert present == {0, smap["world"]["S"], smap["world"]["1"], smap["alien"]}
    # agent box is 2 cells tall, 1 wide (2:1 aspect)
    agent_px = int(np.sum(labels == smap["alien"]))
    kx = 128 * game.zoom / game.maze_w
    assert abs(agent_px - kx * 2 * kx) / (kx * 2 * kx) < 0.35

    # after the coin is eaten it disappears from the map
    labels_end = render_game_frame(game, len(game.frames) - 1,
                                   mode="smap", resolution=128)
    assert smap["world"]["1"] not in set(np.unique(labels_end))


def test_rgb_rendering_and_video():
    game = _make_game()
    video = render_game_video(game, 0, 4, mode="rgb", resolution=64)
    assert video.shape == (4, 64, 64, 3)
    assert video.dtype == np.uint8
    # frames differ as the agent moves
    assert np.any(video[0] != video[3])


def test_prepare_cli_feeds_mugen_datamodule(tmp_path):
    from multimodal_tpu.examples.mugen.coinrun.prepare import prepare_dataset
    from multimodal_tpu.examples.mugen.data import MUGENDataModule

    json_dir = tmp_path / "games"
    json_dir.mkdir()
    for i in range(3):
        _make_game().save_json(str(json_dir / f"game{i}.json"))

    out = tmp_path / "data"
    meta = prepare_dataset(str(json_dir), str(out), resolution=64)
    meta_data = json.load(open(meta))
    assert len(meta_data["data"]) == 3
    assert meta_data["data"][0]["annotations"][0]["text"].startswith("Mugen ")

    dm = MUGENDataModule(
        str(out), str(out / "frames"),
        text_transform=lambda ts: np.asarray(
            [[1] + [ord(c) % 50 for c in t[:6]] + [2] for t in ts]
        ),
        sequence_length=4, sample_every_n_frames=3, text_len=8,
        batch_size=2, prefetch=0, shuffle=False,
    )
    batch = next(iter(dm))
    assert batch["video"].shape == (2, 4, 64, 64, 3)
    assert batch["text"].shape == (2, 8)
