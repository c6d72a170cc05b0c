"""Lane-count scaling sweep for continuous selfplay on the real chip.

Finds the per-chip throughput sweet spot: small lane counts keep the whole
tree VMEM-resident across a search (v5e: 128 MB VMEM), large ones spill to
HBM.  Continuous mode makes lane count independent of samples/generation.
"""
import time

import jax

from alphatpu.buffer import create_buffer
from alphatpu.games import make_game
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import SelfplayConfig, selfplay_continuous

game = make_game("connect4")
params = init_params(jax.random.key(0), config_for_game(game))
run = jax.jit(selfplay_continuous, static_argnums=(0, 1, 5))

for G in (4096, 8192, 16384, 32768):
    rounds = (8192 * 168) // G  # constant total decisions per sweep point
    buf = create_buffer(game, capacity=2_000_000)
    cfg = SelfplayConfig(num_games=G, rollouts=64, continuous=True,
                         rounds=rounds)
    b2, stats, _ = run(game, apply_inference, params, buf, jax.random.key(1),
                       cfg)
    _ = jax.device_get(stats["wins"])
    t0 = time.time()
    b2, stats, _ = run(game, apply_inference, params, buf, jax.random.key(2),
                       cfg)
    s = jax.device_get(stats)
    dt = time.time() - t0
    sps = int(s["samples_written"]) / dt
    print(f"G={G:6d} rounds={rounds:4d}: {dt:6.2f}s  "
          f"samples={int(s['samples_written'])}  env-steps/s={sps:,.0f}")
