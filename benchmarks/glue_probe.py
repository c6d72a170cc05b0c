"""Glue ablation: selfplay_continuous at rollouts=1 (search negligible)
vs rollouts=64, 8k vs 32k lanes, constant total decisions."""
import time
import jax
from alphatpu.buffer import create_buffer
from alphatpu.games import make_game
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import SelfplayConfig, selfplay_continuous

game = make_game("connect4")
params = init_params(jax.random.key(0), config_for_game(game))
run = jax.jit(selfplay_continuous, static_argnums=(0, 1, 5))
for R in (1, 64):
    for G in (8192, 32768):
        rounds = (8192 * 168) // G
        buf = create_buffer(game, capacity=2_000_000)
        cfg = SelfplayConfig(num_games=G, rollouts=R, continuous=True,
                             rounds=rounds)
        b2, stats, _ = run(game, apply_inference, params, buf,
                           jax.random.key(1), cfg)
        _ = jax.device_get(stats["wins"])
        ts = []
        for i in range(3):
            t0 = time.time()
            b2, stats, _ = run(game, apply_inference, params, buf,
                               jax.random.key(2 + i), cfg)
            s = jax.device_get(stats)
            ts.append(time.time() - t0)
        dt = sorted(ts)[1]
        dec = G * rounds
        print(f"R={R:3d} G={G:6d}: {dt:6.2f}s  decisions/s={dec/dt:,.0f}  "
              f"us/decision={dt/dec*1e6:.3f}", flush=True)
