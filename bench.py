"""Benchmark: selfplay throughput on the reference's headline workload shape.

Runs one Connect-4 selfplay generation - 64 MCTS rollouts per move, the
reference 512x4 net - at the largest game batch that fits, and reports
env-steps/s (game moves decided per second, each backed by a full 64-rollout
search).  Prints ONE JSON line.

The reference publishes no absolute throughput (BASELINE.md), so
``vs_baseline`` is reported against the fixed anchor below once we have
measured rounds to compare; round 1 establishes the number.
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax


def main():
    # 8192 lanes is the single-chip sweet spot: the whole tree stays
    # VMEM-resident across a search (v5e has 128 MB VMEM), and continuous
    # mode decouples lane count from samples per generation - more samples
    # just means more rounds.
    games = int(os.environ.get("BENCH_GAMES", 8192))
    rollouts = int(os.environ.get("BENCH_ROLLOUTS", 64))
    game_name = os.environ.get("BENCH_GAME", "connect4")
    bf16 = os.environ.get("BENCH_BF16", "") not in ("", "0")

    from functools import partial

    import jax.numpy as jnp

    from alphatpu.buffer import create_buffer
    from alphatpu.games import make_game
    from alphatpu.nets import apply_inference, config_for_game, init_params

    game = make_game(game_name)
    # enough rounds that every lane plays >= 2 full games at worst case
    rounds = int(
        os.environ.get("BENCH_ROUNDS", 0)
    ) or max(168, 2 * game.max_game_length)
    net_apply = (
        partial(apply_inference, compute_dtype=jnp.bfloat16)
        if bf16 else apply_inference
    )

    from alphatpu.selfplay import SelfplayConfig, selfplay_continuous

    params = init_params(jax.random.key(0), config_for_game(game))
    # Continuous selfplay (lane recycling) is the production generation mode:
    # every lane plays back-to-back games, every round is a full
    # ``rollouts``-deep decision that lands a training sample.
    cfg = SelfplayConfig(
        num_games=games, rollouts=rollouts, cpuct=1.5,
        continuous=True, rounds=rounds,
    )
    buf = create_buffer(game, capacity=2_000_000)

    run = jax.jit(selfplay_continuous, static_argnums=(0, 1, 5))

    # compile + warm run (excluded from timing).  NB: device_get, not
    # block_until_ready - the axon tunnel backend's block_until_ready
    # returns before execution finishes, silently folding server-side
    # compile time into the timed region.
    buf2, stats = run(game, net_apply, params, buf, jax.random.key(1), cfg)
    jax.device_get(stats["wins"])

    t0 = time.time()
    buf2, stats = run(game, net_apply, params, buf, jax.random.key(2), cfg)
    stats = jax.device_get(stats)
    dt = time.time() - t0

    # env-steps: every (game, move) with the game still alive got a full
    # 64-rollout decision; that count equals samples_written (+ alive moves
    # of unfinished games, negligible).
    env_steps = float(stats["samples_written"])
    steps_per_s = env_steps / dt
    rollouts_per_s = steps_per_s * rollouts

    # Anchor: this framework's unoptimized round-1 build (one-shot
    # generation, pure jnp phases) measured on the same chip and workload
    # shape: 50,047 env-steps/s on TPU v5e-1.  The reference publishes no
    # absolute numbers, so vs_baseline tracks speedup over that anchor.
    anchor = float(os.environ.get("BENCH_ANCHOR_STEPS_PER_S", 50047.0)) or None
    result = {
        "metric": f"selfplay_env_steps_per_s_{game_name}_g{games}_r{rollouts}"
                  + ("_bf16" if bf16 else ""),
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / anchor, 3) if anchor else None,
        "extra": {
            "wall_s": round(dt, 2),
            "rollouts_per_s": round(rollouts_per_s, 1),
            "games": games,
            "rollouts": rollouts,
            "mean_game_length": round(float(stats["mean_length"]), 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
