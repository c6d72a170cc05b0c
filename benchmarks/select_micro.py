"""Micro-bench of select_pallas / backup_pallas on a realistic grown tree.

Splits the select cost into gather vs Newton by capping the Newton chunk
count (NEWTON_CHUNKS=k env knob).  Timings scan the kernel R times in-graph
(the axon tunnel has a ~1 ms per-dispatch floor).

Env knobs: GAME (hex7), G (8192), R (64).
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
tree = jax.tree.map(lambda x: jax.device_get(x), tree)
tree = jax.tree.map(lambda x: jnp.asarray(x), tree)
D = min(game.max_game_length, R)
print(f"occupancy: next_idx mean={float(jax.device_get(tree.next_idx.mean())):.1f}")


def time_scan(name, fn, *args):
    @jax.jit
    def run(key, *a):
        def body(c, k):
            p = jax.random.uniform(k, (D, G))
            out = fn(*a, p)
            return c + out, None
        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, R))
        return c
    jax.device_get(run(jax.random.key(2), *args))
    t0 = time.time()
    jax.device_get(run(jax.random.key(3), *args))
    dt = (time.time() - t0) * 1000
    print(f"{name:28s} {dt:8.1f} ms / {R} calls  ({dt/R:.3f} ms/call)",
          flush=True)


def sel(prior, wsum, visits, parent, af, expanded, p):
    out = pk.select_pallas(prior, wsum, visits, parent, af, expanded, p, 1.5)
    return out[5].sum()  # root_pi


time_scan("select (full newton)", sel, tree.prior, tree.wsum, tree.visits,
          tree.parent, tree.action_from, tree.expanded)

orig = pk.NEWTON_MAX_CHUNKS
pk.NEWTON_MAX_CHUNKS = 1
pk.select_pallas._clear_cache()
time_scan("select (newton capped 1)", sel, tree.prior, tree.wsum,
          tree.visits, tree.parent, tree.action_from, tree.expanded)
pk.NEWTON_MAX_CHUNKS = orig
pk.select_pallas._clear_cache()

# backup on the paths the real select produces
path = pk.select_pallas(tree.prior, tree.wsum, tree.visits, tree.parent,
                        tree.action_from, tree.expanded,
                        jax.random.uniform(jax.random.key(9), (D, G)), 1.5)
pnodes, pactions = path[0], path[1]
plen = (pnodes >= 0).sum(0).astype(jnp.int32)
print(f"path length mean={float(plen.mean()):.2f} max={int(plen.max())}")
val = jax.random.uniform(jax.random.key(10), (G,))


def bkp(wsum, visits, p):
    w2, v2 = pk.backup_pallas(wsum, visits, pnodes, pactions, plen, val)
    return w2[0, 0].sum()


time_scan("backup", bkp, tree.wsum, tree.visits)
