"""A/B the select kernel's wide-board gather variants on a synthetic tree.

Builds a realistic random tree (allocation-ordered parents, geometric-ish
depth) in numpy - no run_mcts compile - so each variant compiles in
seconds and the timing isolates the kernel.

Env knobs: GAME (hex7), G (8192), V (64), R (scan length, 64),
ALPHATPU_SELECT_GATHER (comma list of variants to time, default all).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_tree(A, V, G, seed=0):
    """Random allocation-ordered tree + stats, shaped like mid-search."""
    rng = np.random.default_rng(seed)
    prior = rng.random((A, V, G), np.float32)
    prior /= prior.sum(0)
    visits = rng.integers(0, 4, (A, V, G)).astype(np.float32)
    wsum = visits * rng.random((A, V, G), np.float32)
    child = np.zeros((A, V, G), np.int32)
    expanded = np.ones((V, G), np.int8)
    # node v's parent is uniform over [0, v): depth ~ log(V), like MCTS
    parents = (rng.random((V, G)) * np.maximum(np.arange(V), 1)[:, None])
    parents = parents.astype(np.int64)
    acts = rng.integers(0, A, (V, G))
    gi = np.arange(G)
    for v in range(1, V):
        child[acts[v], parents[v], gi] = v
    return prior, wsum, visits, child, expanded


def main():
    import jax
    import jax.numpy as jnp

    from alphatpu.mcts import pallas_kernels as pk

    G = int(os.environ.get("G", 8192))
    V = int(os.environ.get("V", 64))
    R = int(os.environ.get("R", 64))
    game = os.environ.get("GAME", "hex7")
    from alphatpu.games import make_game

    g = make_game(game)
    A = g.max_actions
    D = min(g.max_game_length, V)
    print(f"game={game} A={A} V={V} G={G} D={D} scan={R}", flush=True)

    tree = synthetic_tree(A, V, G)
    args = tuple(jnp.asarray(x) for x in tree)

    def run_variant(name):
        pk.SELECT_GATHER = name
        pk.select_pallas._clear_cache()

        @jax.jit
        def run(key):
            def body(c, k):
                p = jax.random.uniform(k, (D, G))
                out = pk.select_pallas(*args, p, 1.5)
                return c + out[5].sum() + out[3].sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jax.random.split(key, R))
            return c

        chk = jax.device_get(run(jax.random.key(2)))
        t0 = time.time()
        chk2 = jax.device_get(run(jax.random.key(3)))
        dt = (time.time() - t0) * 1000
        print(f"{name:12s} {dt:8.1f} ms / {R} calls ({dt/R:.3f} ms/call)"
              f"  chk={chk:.1f}/{chk2:.1f}", flush=True)

    names = os.environ.get("VARIANTS", "slices,block").split(",")
    for n in names:
        run_variant(n)


if __name__ == "__main__":
    main()
