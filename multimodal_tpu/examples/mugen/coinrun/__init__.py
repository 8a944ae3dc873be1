from multimodal_tpu.examples.mugen.coinrun.game import Agent, Frame, Game, Monster
from multimodal_tpu.examples.mugen.coinrun.text_desc import convert_game_to_text_desc

__all__ = ["Agent", "Frame", "Game", "Monster", "convert_game_to_text_desc"]
