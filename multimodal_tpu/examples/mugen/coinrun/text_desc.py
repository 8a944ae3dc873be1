"""Auto-captioning of coinrun replays (MUGEN's text-description generator).

Parity with reference ``examples/mugen/data/coinrun/generate_text_desc.py``
(Sequence:10, process_sequence:293, convert_game_to_text_desc:327): frames
segment into pose runs (ground/jump/climb/hit), bumped-head and same-level
jumps merge adjacent jump runs, each long-enough run gets a templated
description (movement direction, jump destination from the maze cell under
the landing point, monsters jumped over / killed, coins/gems collected,
shield toggles, killer monster), and the run texts join as
``"<alien> <desc>, and <desc>, ..."``. Output strings are kept EXACTLY
identical to the reference templates — they are the dataset's label space.
"""

from __future__ import annotations

import json
from typing import List

from multimodal_tpu.examples.mugen.coinrun.game import Game

MIN_LEN_FOR_TEXT_DESC = 5
MAX_GROUND_SEQ_LEN_TO_MERGE = 5

_GROUND_CELLS = "SAab"
_CRATE_CELLS = "#$&%"
_AIR_CELLS = ".12"


class Sequence:
    """One pose run with its movement endpoints and event metadata."""

    def __init__(self, start_frame, end_frame, pose_type,
                 start_x, start_y, end_x, end_y):
        self.start_frame = start_frame
        self.end_frame = end_frame
        self.pose_type = pose_type  # ground | jump | climb | hit
        self.start_x, self.start_y = start_x, start_y
        self.end_x, self.end_y = end_x, end_y
        self.time_jumps = 1 if pose_type == "jump" else 0
        self.end_maze_above = "."
        self.end_maze_below = "."
        self.num_coins_eaten = 0
        self.num_gems_eaten = 0
        self.start_shield = False
        self.end_shield = False
        self.changed_shield = False
        self.killed_monsters: List[str] = []
        self.jump_over_monsters: List[str] = []
        self.killed_by = ""
        self.text_desc = ""

    def asdict(self):
        return {
            "start_frame": self.start_frame, "end_frame": self.end_frame,
            "pose_type": self.pose_type,
            "start_xy": (self.start_x, self.start_y),
            "end_xy": (self.end_x, self.end_y),
            "bumped_head": self.is_bumped_head(),
            "same_level_jump": self.is_same_level_jump(),
            "num_coins_eaten": self.num_coins_eaten,
            "num_gems_eaten": self.num_gems_eaten,
            "start_shield": self.start_shield, "end_shield": self.end_shield,
            "changed_shield": self.changed_shield,
            "killed_monsters": self.killed_monsters,
            "jump_over_monsters": self.jump_over_monsters,
            "killed_by": self.killed_by, "text_desc": self.text_desc,
        }

    def __repr__(self):
        return json.dumps(self.asdict())

    def is_bumped_head(self) -> bool:
        # a head bump shows as a 1-2 frame 'ground' run with air below
        return (
            self.pose_type == "ground"
            and self.end_frame - self.start_frame <= 1
            and self.end_maze_below in _AIR_CELLS
        )

    def is_same_level_jump(self) -> bool:
        return self.pose_type == "jump" and abs(self.end_y - self.start_y) <= 0.5

    def merge_sequences(self, others: List["Sequence"]) -> None:
        self.end_frame = others[-1].end_frame
        self.end_x, self.end_y = others[-1].end_x, others[-1].end_y
        self.end_maze_above = others[-1].end_maze_above
        self.end_maze_below = others[-1].end_maze_below
        for seq in others:
            if seq.is_bumped_head():
                self.time_jumps -= 1
            self.time_jumps += seq.time_jumps
            self.num_coins_eaten += seq.num_coins_eaten
            self.num_gems_eaten += seq.num_gems_eaten
            self.killed_monsters.extend(seq.killed_monsters)
            self.jump_over_monsters.extend(seq.jump_over_monsters)

    # ---- metadata from the game state ------------------------------------

    def process_metadata(self, game: Game) -> None:
        if not game.flattened_monster_names:
            game.flatten_monster_names()

        # coins/gems collected during the run (diff the eaten sets)
        prev_id = max(self.start_frame - 1, 0)
        if len(game.frames[self.end_frame].coins_eaten) > len(
            game.frames[prev_id].coins_eaten
        ):
            before = {tuple(c) for c in game.frames[prev_id].coins_eaten}
            after = {tuple(c) for c in game.frames[self.end_frame].coins_eaten}
            for cx, cy in after - before:
                if game.maze[cy][cx] == "2":
                    self.num_gems_eaten += 1
                else:
                    self.num_coins_eaten += 1

        self.start_shield = game.frames[self.start_frame].agent.power_up_mode
        self.end_shield = game.frames[self.end_frame].agent.power_up_mode
        states = {
            game.frames[i].agent.power_up_mode
            for i in range(self.start_frame, self.end_frame + 1)
        }
        self.changed_shield = len(states) > 1

        # kills: a monster flipping to dead within [start, end+2)
        end_id = min(self.end_frame + 2, len(game.frames))
        prev_dead = None
        for fid in range(self.start_frame, end_id):
            frame = game.frames[fid]
            dead = {i for i, m in enumerate(frame.monsters) if m.is_dead}
            if prev_dead is not None and len(dead) > len(prev_dead):
                theme = frame.monsters[sorted(dead - prev_dead)[0]].theme
                self.killed_monsters.append(
                    game.flattened_monster_names[theme]
                )
            prev_dead = dead

        # who killed the agent: nearest monster at the hit run's first frame
        if self.pose_type == "hit":
            best, best_dist = -1, 1000.0
            for m in game.frames[self.start_frame].monsters:
                d = (self.start_x - m.x) ** 2 + (self.start_y - m.y) ** 2
                if d < best_dist:
                    best, best_dist = m.theme, d
            if best != -1:
                self.killed_by = game.flattened_monster_names[best]

        # monsters jumped over: share the pre-jump ground cell at some frame
        if self.pose_type == "jump":
            ground_y = round(self.start_y)
            over = set()
            frame = game.frames[self.start_frame]
            for fid in range(self.start_frame, self.end_frame + 1):
                frame = game.frames[fid]
                loc = (round(frame.agent.x), ground_y)
                for i, m in enumerate(frame.monsters):
                    if (round(m.x), round(m.y)) == loc:
                        over.add(i)
            for i in over:
                if not game.frames[end_id - 1].monsters[i].is_dead:
                    self.jump_over_monsters.append(
                        game.flattened_monster_names[frame.monsters[i].theme]
                    )

    # ---- templates (string-identical to the reference) -------------------

    def generate_text_desc(self) -> None:
        if self.end_frame - self.start_frame < MIN_LEN_FOR_TEXT_DESC:
            self.text_desc = ""
            return
        if self.pose_type == "hit":
            self.text_desc = (
                f"killed by a {self.killed_by}" if self.killed_by
                else "killed by a monster"
            )
            return

        if self.end_y - self.start_y > 0.5:
            y_direct = " up"
        elif self.start_y - self.end_y > 0.5:
            y_direct = " down"
        else:
            y_direct = " a bit" if self.pose_type == "ground" else ""
        if self.end_x - self.start_x > 0.5:
            x_direct = " to the right"
        elif self.start_x - self.end_x > 0.5:
            x_direct = " to the left"
        else:
            x_direct = " a bit" if self.pose_type == "ground" else ""

        if self.pose_type == "climb":
            self.text_desc = f"climbs{y_direct} on a ladder"
        elif self.pose_type == "ground":
            self.text_desc = f"walks{x_direct}"
        elif self.pose_type == "jump":
            times = " a few times" if self.time_jumps >= 2 else ""
            dest = ""
            if y_direct != "":
                if self.end_maze_below in _GROUND_CELLS:
                    dest = (" to the ground" if self.end_y < 1.5
                            else " to a platform")
                elif self.end_maze_below in _CRATE_CELLS:
                    dest = " to a crate"
                elif self.end_maze_below == "=":
                    dest = " to a ladder"
            over = ""
            if self.jump_over_monsters:
                over = " over a " + " and a ".join(self.jump_over_monsters)
            self.text_desc = f"jumps{y_direct}{times}{x_direct}{over}{dest}"

        if self.num_coins_eaten > 0 or self.num_gems_eaten > 0:
            self.text_desc += self._collect_desc()
        if self.killed_monsters:
            self.text_desc += " and killed a " + " and a ".join(
                self.killed_monsters
            )

    def _collect_desc(self) -> str:
        parts = []
        if self.num_coins_eaten == 1:
            parts.append(" a coin")
        elif self.num_coins_eaten > 1:
            parts.append(" a few coins")
        if self.num_gems_eaten == 1:
            parts.append(" a gem")
        elif self.num_gems_eaten > 1:
            parts.append(" a few gems")
        joined = " and".join(parts)
        if self.changed_shield:
            joined += self._shield_desc()
        return f" and collects{joined}"

    def _shield_desc(self) -> str:
        if not self.start_shield and self.end_shield:
            return " to turn on the shield"
        if self.start_shield and not self.end_shield:
            return " to turn off the shield"
        if self.start_shield:
            return " to turn shield off then on again"
        return " to turn shield on then off again"


def _make_sequence(game: Game, pose_type: str, start_i: int, curr_i: int,
                   last_seq: bool) -> Sequence:
    # jump runs take their endpoints one frame outside the run so the launch
    # and landing positions are real ground positions
    if pose_type == "jump":
        pos_start, pos_end = max(start_i - 1, 0), curr_i
    else:
        pos_start = start_i
        pos_end = curr_i - 1 if not last_seq else curr_i
    seq = Sequence(
        start_frame=start_i,
        end_frame=curr_i - 1 if not last_seq else curr_i,
        pose_type=pose_type,
        start_x=game.frames[pos_start].agent.x,
        start_y=game.frames[pos_start].agent.y,
        end_x=game.frames[pos_end].agent.x,
        end_y=game.frames[pos_end].agent.y,
    )
    seq.end_maze_above = game.maze[round(seq.end_y) + 1][round(seq.end_x)]
    seq.end_maze_below = game.maze[round(seq.end_y) - 1][round(seq.end_x)]
    # a jump can end slightly past a cliff edge; probe the neighbor cell
    if pose_type == "jump" and seq.end_maze_below in _AIR_CELLS:
        neighbor_x = int(seq.end_x) * 2 + 1 - round(seq.end_x)
        seq.end_maze_below = game.maze[round(seq.end_y) - 1][neighbor_x]
    return seq


def _pose_type(pose: str) -> str:
    pose = pose.strip("12")
    return "ground" if pose in ("walk", "duck", "stand") else pose


def convert_game_to_text_desc(game: Game, start_idx: int = 0,
                              end_idx: int = -1,
                              alien_name: str = "Mugen") -> str:
    if alien_name is None:
        alien_name = "Mugen"
    if end_idx == -1:
        end_idx = len(game.frames)
    start_idx = max(0, start_idx)
    end_idx = min(len(game.frames), end_idx)

    # 1. segment into pose runs
    sequences: List[Sequence] = []
    start_i, curr_type = 0, None
    i = 0
    for i, frame in enumerate(game.frames[start_idx:end_idx]):
        ptype = _pose_type(frame.agent.pose)
        if i == 0:
            start_i, curr_type = 0, ptype
            continue
        if ptype != curr_type:
            sequences.append(_make_sequence(
                game, curr_type, start_idx + start_i, start_idx + i, False
            ))
            start_i, curr_type = i, ptype
    sequences.append(_make_sequence(
        game, curr_type, start_idx + start_i, start_idx + i, True
    ))

    # 2. merge jump-bump-jump triples (a head bump splits one jump in two)
    merged: List[Sequence] = []
    si = 0
    while si < len(sequences):
        if (
            0 < si < len(sequences) - 1
            and sequences[si].is_bumped_head()
            and merged and merged[-1].pose_type == "jump"
            and sequences[si + 1].pose_type == "jump"
        ):
            merged[-1].merge_sequences(sequences[si:si + 2])
            si += 2
        else:
            merged.append(sequences[si])
            si += 1
    sequences = merged

    # 3. merge jump-shortground-jump triples when both jumps stay level
    result: List[Sequence] = []
    si = 0
    while si < len(sequences):
        seq = sequences[si]
        mergeable = (
            seq.pose_type == "ground"
            and 0 < si < len(sequences) - 1
            and result and result[-1].pose_type == "jump"
            and sequences[si + 1].pose_type == "jump"
            and result[-1].is_same_level_jump()
            and sequences[si + 1].is_same_level_jump()
            and seq.end_frame - seq.start_frame < MAX_GROUND_SEQ_LEN_TO_MERGE
        )
        if mergeable:
            result[-1].merge_sequences(sequences[si:si + 2])
            si += 2
        else:
            result.append(seq)
            si += 1

    # 4. describe
    descs = []
    for seq in result:
        seq.process_metadata(game)
        seq.generate_text_desc()
        if seq.text_desc:
            descs.append(seq.text_desc)
    return alien_name + " " + ", and ".join(descs)
