"""Compare one-shot vs continuous selfplay throughput on the real chip."""
import time
import jax

from alphatpu.buffer import create_buffer
from alphatpu.games import make_game
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import (
    SelfplayConfig, selfplay_continuous, selfplay_generation,
)

G, R = 16384, 64
game = make_game("connect4")
params = init_params(jax.random.key(0), config_for_game(game))
buf = create_buffer(game, capacity=2_000_000)

for name, fn, cfg in [
    ("one-shot (42 rounds)", selfplay_generation,
     SelfplayConfig(num_games=G, rollouts=R)),
    ("continuous (42 rounds)", selfplay_continuous,
     SelfplayConfig(num_games=G, rollouts=R, continuous=True, rounds=42)),
    ("continuous (84 rounds)", selfplay_continuous,
     SelfplayConfig(num_games=G, rollouts=R, continuous=True, rounds=84)),
]:
    run = jax.jit(fn, static_argnums=(0, 1, 5))
    b2, stats = run(game, apply_inference, params, buf, jax.random.key(1), cfg)
    jax.device_get(stats["wins"])
    t0 = time.time()
    b2, stats = run(game, apply_inference, params, buf, jax.random.key(2), cfg)
    stats = jax.device_get(stats)
    dt = time.time() - t0
    sps = float(stats["samples_written"]) / dt
    print(f"{name:26s} {dt:6.2f}s  {sps:10.0f} env-steps/s  "
          f"(samples={int(stats['samples_written'])}, "
          f"mean_len={float(stats['mean_length']):.2f})")
