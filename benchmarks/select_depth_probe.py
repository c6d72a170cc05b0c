"""Probe: select_pallas cost vs walk depth cap D on a grown hex7 tree.

The walk's while_loop is bounded by min(D, tree depth); sweeping D on the
same tree separates per-depth-step cost from fixed kernel overhead.
"""
import os
import time

import jax
import jax.numpy as jnp

from alphatpu.games import make_game
from alphatpu.mcts import pallas_kernels as pk
from alphatpu.mcts.search import run_mcts
from alphatpu.mcts.tree import init_tree
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import broadcast_initial

G = int(os.environ.get("G", 8192))
R = int(os.environ.get("R", 64))
game = make_game(os.environ.get("GAME", "hex7"))
print(f"game={game.name} G={G} R={R} A={game.max_actions}", flush=True)
params = init_params(jax.random.key(0), config_for_game(game))
positions = broadcast_initial(game, G)
tree = init_tree(game, positions, R)
tree, _ = run_mcts(
    game, apply_inference, params, tree, jax.random.key(1),
    rollouts=R - 2, cpuct=1.5, training=True,
)
tree = jax.tree.map(lambda x: jnp.asarray(jax.device_get(x)), tree)


def time_at_depth(D):
    @jax.jit
    def run(key, prior, wsum, visits, parent, af, expanded):
        def body(c, k):
            p = jax.random.uniform(k, (D, G))
            out = pk.select_pallas(prior, wsum, visits, parent, af, expanded,
                                   p, 1.5)
            return c + out[5].sum(), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, R))
        return c

    args = (tree.prior, tree.wsum, tree.visits, tree.parent,
            tree.action_from, tree.expanded)
    jax.device_get(run(jax.random.key(2), *args))
    t0 = time.time()
    jax.device_get(run(jax.random.key(3), *args))
    dt = (time.time() - t0) * 1000
    print(f"D={D:3d}  {dt:8.1f} ms / {R} calls  ({dt/R:.3f} ms/call)",
          flush=True)


for D in (1, 2, 4, 8, 16, 24):
    time_at_depth(D)
