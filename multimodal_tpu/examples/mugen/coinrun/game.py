"""Coinrun game-state data model (MUGEN's level/replay JSONs).

Parity with reference ``examples/mugen/data/coinrun/game.py`` (Game:10,
Frame:105, Agent:134, Monster:235): the JSON schema the MUGEN release ships
(maze grid + per-frame agent/monster states), pose derivation from velocity
and animation counters, monster-name flattening (ground, then walking, then
flying — order is the ``theme`` index space), and the eaten-coin restore
fix-up for 3-second clip JSONs.

This is the host-side source of truth the renderer (``render.py``) and the
auto-captioner (``text_desc.py``) consume; the round-3 ``prepare`` CLI turns
a directory of these JSONs into the dense ``{id}.npy`` clips + captions the
TPU input pipeline reads.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

# maze cell glyphs (reference construct_from_json.py:16-29)
SPACE = "."
LADDER = "="
LAVA_SURFACE = "^"
LAVA_MIDDLE = "|"
WALL_SURFACE = "S"
WALL_MIDDLE = "A"
WALL_CLIFF_LEFT = "a"
WALL_CLIFF_RIGHT = "b"
COIN = "1"
GEM = "2"
CRATE_NORMAL = "#"
CRATE_DOUBLE = "$"
CRATE_SINGLE = "&"
CRATE_WARNING = "%"

DEATH_ANIM_LENGTH = 30
FINISHED_LEVEL_ANIM_LENGTH = 20
MONSTER_DEATH_ANIM_LENGTH = 3

ANIM_FREQ = 5  # agent walk/climb animation alternation period (hard-coded)


class Agent:
    """Per-frame agent state; pose/facing/animation phase are DERIVED from
    the dynamics (reference game.py:189-207), not stored."""

    def __init__(self, x, y, vx=0.0, vy=0.0, time_alive=0, ladder=False,
                 spring=0, is_killed=False, killed_animation_frame_cnt=0,
                 finished_level_frame_cnt=0, killed_monster=False,
                 bumped_head=False, collected_coin=False, collected_gem=False,
                 power_up_mode=False, **_ignored):
        self.x = x
        self.y = y
        self.vx = vx
        self.vy = vy
        self.time_alive = time_alive
        self.ladder = ladder
        self.spring = spring
        self.is_killed = is_killed
        self.killed_animation_frame_cnt = killed_animation_frame_cnt
        self.finished_level_frame_cnt = finished_level_frame_cnt
        self.killed_monster = killed_monster
        self.bumped_head = bumped_head
        self.collected_coin = collected_coin
        self.collected_gem = collected_gem
        self.power_up_mode = power_up_mode
        self.anim_freq = ANIM_FREQ
        self.is_facing_right = self.vx >= 0
        self.walk1_mode = (self.time_alive // self.anim_freq) % 2 == 0
        self.pose = self._derive_pose()

    def _derive_pose(self) -> str:
        if self.is_killed:
            return "hit"
        if self.ladder:
            return "climb1" if self.walk1_mode else "climb2"
        if self.vy != 0:
            return "jump"
        if self.spring != 0:
            return "duck"
        if self.vx == 0:
            return "stand"
        return "walk1" if self.walk1_mode else "walk2"

    def asdict(self) -> Dict[str, Any]:
        return {
            "x": self.x, "y": self.y, "vx": self.vx, "vy": self.vy,
            "time_alive": self.time_alive, "ladder": self.ladder,
            "spring": self.spring, "is_killed": self.is_killed,
            "killed_animation_frame_cnt": self.killed_animation_frame_cnt,
            "finished_level_frame_cnt": self.finished_level_frame_cnt,
            "killed_monster": self.killed_monster,
            "bumped_head": self.bumped_head,
            "collected_coin": self.collected_coin,
            "collected_gem": self.collected_gem,
            "power_up_mode": self.power_up_mode,
            "anim_freq": self.anim_freq,
            "is_facing_right": self.is_facing_right,
            "walk1_mode": self.walk1_mode,
            "pose": self.pose,
        }

    def __repr__(self):
        return json.dumps(self.asdict())


class Monster:
    def __init__(self, m_id, x, y, vx=0.0, vy=0.0, theme=0, is_flying=False,
                 is_walking=False, is_jumping=False, is_dead=False, time=0,
                 anim_freq=1, monster_dying_frame_cnt=0, **_ignored):
        self.m_id = m_id
        self.x = x
        self.y = y
        self.vx = vx
        self.vy = vy
        self.theme = theme
        self.is_flying = is_flying
        self.is_walking = is_walking
        self.is_jumping = is_jumping
        self.is_dead = is_dead
        self.time = time
        self.anim_freq = anim_freq
        self.monster_dying_frame_cnt = monster_dying_frame_cnt
        # jumping monsters animate by vertical speed; others by time parity
        # (reference game.py:263-270)
        if self.is_jumping:
            self.walk1_mode = self.vy == 0
        else:
            self.walk1_mode = (self.time // self.anim_freq) % 2 == 0

    def asdict(self) -> Dict[str, Any]:
        return {
            "m_id": self.m_id, "x": self.x, "y": self.y, "vx": self.vx,
            "vy": self.vy, "theme": self.theme, "is_flying": self.is_flying,
            "is_walking": self.is_walking, "is_jumping": self.is_jumping,
            "is_dead": self.is_dead, "time": self.time,
            "anim_freq": self.anim_freq,
            "monster_dying_frame_cnt": self.monster_dying_frame_cnt,
            "walk1_mode": self.walk1_mode,
        }

    def __repr__(self):
        return json.dumps(self.asdict())


class Frame:
    def __init__(self, frame_id=-1, file_name="", state_time=0,
                 coins_eaten=None, agent=None, monsters=None, **_ignored):
        self.frame_id = frame_id
        self.file_name = file_name
        self.state_time = state_time
        self.coins_eaten = coins_eaten if coins_eaten is not None else []
        self.agent = Agent(**agent) if isinstance(agent, dict) else agent
        self.monsters = [
            Monster(**m) if isinstance(m, dict) else m
            for m in (monsters or [])
        ]

    def asdict(self) -> Dict[str, Any]:
        return {
            "frame_id": self.frame_id,
            "file_name": self.file_name,
            "state_time": self.state_time,
            "coins_eaten": self.coins_eaten,
            "agent": self.agent.asdict() if self.agent is not None else None,
            "monsters": [m.asdict() for m in self.monsters],
        }

    def __repr__(self):
        return json.dumps(self.asdict())


class Game:
    """A level + replay: maze grid, themes, and the frame sequence."""

    def __init__(self, **kwargs):
        self.game_id = -1
        self.level_seed = 0
        self.rl_agent_seed = 0
        self.zoom = 5.5
        self.bgzoom = 0.4
        self.world_theme_n = -1
        self.agent_theme_n = -1
        self.background_themes: List[str] = []
        self.ground_themes: List[str] = []
        self.agent_themes: List[str] = []
        self.monster_names: Dict[str, List[str]] = {}
        self.flattened_monster_names: List[str] = []
        self.video_res = 1024
        self.maze_w = 64
        self.maze_h = 13
        self.maze: Optional[List[str]] = None
        self.frames: List[Frame] = []
        self.__dict__.update(**kwargs)
        self.frames = [
            Frame(**f) if isinstance(f, dict) else f for f in self.frames
        ]

    def asdict(self, f_start: int = -1, f_end: int = -1) -> Dict[str, Any]:
        frames = self.frames if f_end < 0 else self.frames[f_start:f_end]
        return {
            "game_id": self.game_id,
            "level_seed": self.level_seed,
            "rl_agent_seed": self.rl_agent_seed,
            "zoom": self.zoom,
            "bgzoom": self.bgzoom,
            "world_theme_n": self.world_theme_n,
            "agent_theme_n": self.agent_theme_n,
            "background_themes": self.background_themes,
            "ground_themes": self.ground_themes,
            "agent_themes": self.agent_themes,
            "monster_names": self.monster_names,
            "video_res": self.video_res,
            "maze_w": self.maze_w,
            "maze_h": self.maze_h,
            "maze": self.maze,
            "frames": [f.asdict() for f in frames],
        }

    def __repr__(self):
        return json.dumps(self.asdict())

    def save_json(self, path: str, f_start: int = -1, f_end: int = -1) -> None:
        with open(path, "w") as f:
            json.dump(self.asdict(f_start, f_end), f, indent=2)

    def load_json(self, path: str) -> "Game":
        with open(path) as f:
            data = json.load(f)
        self.maze = None
        self.frames = []
        self.__dict__.update(**data)
        self.frames = [Frame(**fr) for fr in self.frames]
        self.flatten_monster_names()
        self.reset_eaten_coins()
        return self

    def flatten_monster_names(self) -> None:
        """ground + walking + flying, in that order — the ``theme`` index
        space every frame refers to (reference game.py:83-90)."""
        self.flattened_monster_names = (
            list(self.monster_names.get("ground", []))
            + list(self.monster_names.get("walking", []))
            + list(self.monster_names.get("flying", []))
        )

    def reset_eaten_coins(self) -> None:
        """Clip JSONs may have dropped coins the agent ate mid-level; put
        the yellow coins back so rendering any frame range is consistent
        (reference game.py:92-104)."""
        if not self.frames:
            return
        for cx, cy in self.frames[-1].coins_eaten:
            if self.maze[cy][cx] == SPACE:
                row = self.maze[cy]
                self.maze[cy] = row[:cx] + COIN + row[cx + 1:]
