"""Attribute the >8k-lane lockstep cliff to a component.

One chip loses 25-35% per lane past ~8192 lockstep lanes (BENCH r3/r4;
routed around with device-sequential superblocks).  This script isolates
WHICH stage carries the cliff: at each lane count it times, separately
and device_get-synced,

* the production fused select kernel (select_apply_packed, one rollout's
  apply + walk) on a realistic grown tree,
* the standalone backup kernel on real select paths,
* the NN forward at the search's batch shape,
* one full run_mcts search (64 rollouts, everything fused),

and prints per-lane microseconds for each - the stage whose per-lane cost
grows past 8k is the cliff.  Interpretation paragraph in
benchmarks/README_cliff.md after a committed run.

Env knobs: GAME (connect4), R (64), LANES (comma list).
"""
import os
import time

import jax
import jax.numpy as jnp

from alphatpu.games import make_game
from alphatpu.mcts import pallas_kernels as pk
from alphatpu.mcts.search import empty_pending, run_mcts
from alphatpu.mcts.tree import init_tree
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import broadcast_initial

R = int(os.environ.get("R", 64))
REPS = int(os.environ.get("REPS", 32))
game = make_game(os.environ.get("GAME", "connect4"))
lanes = [int(x) for x in os.environ.get(
    "LANES", "4096,8192,16384,32768").split(",")]
params = init_params(jax.random.key(0), config_for_game(game))
print(f"game={game.name} A={game.max_actions} R={R} reps={REPS}", flush=True)


def timed(fn, *args, reps=REPS):
    """Median-of-3 of a reps-long in-graph scan (amortizes dispatch)."""
    @jax.jit
    def run(key, *a):
        def body(c, k):
            return c + fn(k, *a), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, reps))
        return c

    jax.device_get(run(jax.random.key(2), *args))
    ts = []
    for i in range(3):
        t0 = time.time()
        jax.device_get(run(jax.random.key(3 + i), *args))
        ts.append(time.time() - t0)
    return sorted(ts)[1] / reps


for G in lanes:
    positions = broadcast_initial(game, G)
    tree0 = init_tree(game, positions, R)
    # realistic mid-search occupancy
    tree, _ = run_mcts(game, apply_inference, params, tree0,
                       jax.random.key(1), rollouts=R - 2, cpuct=1.5,
                       training=True)
    D = min(game.max_game_length, R)
    A = game.max_actions
    scale = pk.value_scale(R)
    packed = pk.pack_stats(tree.wsum, tree.visits, scale)
    pend = empty_pending(D, A, G)

    def sel_apply(k, prior, packed, parent, af, expanded):
        p = jax.random.uniform(k, (D, G))
        out = pk.select_apply_packed(
            prior, packed, parent, af, expanded, p,
            pend.nodes, pend.actions, pend.length, pend.value,
            pend.leaf, pend.newp, pend.write, 1.5, scale=scale)
        return out[7].sum()  # root_pi

    t_sel = timed(sel_apply, tree.prior, packed, tree.parent,
                  tree.action_from, tree.expanded)

    path = pk.select_pallas(tree.prior, tree.wsum, tree.visits, tree.parent,
                            tree.action_from, tree.expanded,
                            jax.random.uniform(jax.random.key(9), (D, G)),
                            1.5)
    pnodes, pactions = path[0], path[1]
    plen = (pnodes >= 0).sum(0).astype(jnp.int32)

    def bkp(k, wsum, visits):
        val = jax.random.uniform(k, (G,))
        w2, v2 = pk.backup_pallas(wsum, visits, pnodes, pactions, plen, val)
        return w2[0, 0].sum()

    t_bkp = timed(bkp, tree.wsum, tree.visits)

    def nn(k, params):
        enc = jax.random.randint(k, (G, 2 * game.vectorized_state), 0, 2
                                 ).astype(jnp.int8)
        logits, v = apply_inference(params, enc)
        return v.sum()

    t_nn = timed(nn, params)

    def search(k, t0):
        t2, pol = run_mcts(game, apply_inference, params, t0, k,
                           rollouts=R, cpuct=1.5, training=True)
        return pol.sum()

    t_search = timed(search, tree0, reps=4)

    ns = 1e9 / G
    print(f"G={G:6d}: select_apply {t_sel*1e3:7.2f} ms "
          f"({t_sel*ns:6.1f} ns/lane)  "
          f"backup {t_bkp*1e3:6.2f} ms ({t_bkp*ns:6.1f})  "
          f"nn {t_nn*1e3:6.2f} ms ({t_nn*ns:6.1f})  "
          f"search[{R}] {t_search*1e3:8.1f} ms ({t_search*ns:7.1f})",
          flush=True)
