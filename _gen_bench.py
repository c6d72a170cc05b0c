import time
import jax
from alphatpu.buffer import create_buffer
from alphatpu.games import make_game
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import SelfplayConfig, selfplay_generation

game = make_game("connect4")
params = init_params(jax.random.key(0), config_for_game(game))
run = jax.jit(selfplay_generation, static_argnums=(0, 1, 5))

for G in (16384, 32768, 65536):
    buf = create_buffer(game, capacity=2_000_000)
    cfg = SelfplayConfig(num_games=G, rollouts=64)
    b2, stats = run(game, apply_inference, params, buf, jax.random.key(1), cfg)
    _ = jax.device_get(stats["wins"])
    t0 = time.time()
    b2, stats = run(game, apply_inference, params, buf, jax.random.key(2), cfg)
    s = jax.device_get(stats)
    dt = time.time()-t0
    print(f"G={G}: {dt:.2f}s  samples={int(s['samples_written'])}  steps/s={int(s['samples_written'])/dt:.0f}")
