"""bench.measure smoke: the driver-facing benchmark path must produce a
well-formed result dict at tiny shapes on any backend."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure  # noqa: E402


def test_measure_smoke():
    r = measure("tictactoe", games=128, rollouts=8, rounds=12)
    assert r["unit"] == "env-steps/s"
    assert r["value"] > 0
    assert r["vs_baseline"] > 0
    ex = r["extra"]
    assert abs(ex["rollouts_per_s"] - r["value"] * 8) < 8  # rounded fields
    assert ex["params"] > 0 and ex["net"] == "6x128"
    assert 0 < ex["mean_game_length"] <= 9
