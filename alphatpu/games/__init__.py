"""Game registry - the five game families of the reference
(README.md:6: Gobang/TicTacToe any N<=13, Connect-4, Reversi 6x6, Reversi 8x8,
Hex any N<=13)."""
from __future__ import annotations

import re

from .base import Game
from .connect4 import Connect4
from .gobang import Gobang, tictactoe
from .hex import Hex
from .reversi import Reversi

__all__ = [
    "Game",
    "Gobang",
    "Connect4",
    "Hex",
    "Reversi",
    "tictactoe",
    "make_game",
    "GAME_NAMES",
]

GAME_NAMES = (
    "tictactoe",
    "gobang",  # gobang<N> e.g. gobang9 (5-in-a-row for N>=9 per README.md:53)
    "connect4",
    "hex",  # hex<N> e.g. hex7
    "reversi6x6",
    "reversi8x8",
)


def make_game(name: str, **kwargs) -> Game:
    """Build a game by name. Accepts e.g. ``tictactoe``, ``connect4``,
    ``gobang9`` (optionally ``nvict=5``), ``hex7``, ``reversi6x6``."""
    name = name.lower()
    if name == "tictactoe":
        return tictactoe()
    if name == "connect4":
        return Connect4()
    if name in ("reversi6x6", "reversi6"):
        return Reversi(6)
    if name in ("reversi8x8", "reversi8", "reversi"):
        return Reversi(8)
    m = re.fullmatch(r"gobang(\d+)", name)
    if m:
        n = int(m.group(1))
        # Reference training recipes use 5-in-a-row for 8x8/9x9 (README.md:49-53).
        nvict = kwargs.pop("nvict", 5 if n >= 8 else n)
        return Gobang(n, nvict)
    m = re.fullmatch(r"hex(\d+)", name)
    if m:
        return Hex(int(m.group(1)))
    raise ValueError(f"unknown game {name!r}; known: {GAME_NAMES}")
