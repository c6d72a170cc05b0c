"""On-TPU parity of the Pallas select/backup kernels vs the jnp reference.

For each game, runs a full 32-rollout search twice on the same tree and
RNG - once through the kernel path (as shipped) and once forcing the jnp
fallback - and compares the resulting trees and root policies.
"""
import jax
import jax.numpy as jnp
import numpy as np

import alphatpu.mcts.pallas_kernels as K
from alphatpu.games import make_game
from alphatpu.mcts.search import run_mcts
from alphatpu.mcts.tree import init_tree
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import broadcast_initial


def check(name, G=1024, R=32, stat_dtype=jnp.float32):
    game = make_game(name)
    params = init_params(jax.random.key(0),
                         config_for_game(game, width=64, depth=2))
    positions = broadcast_initial(game, G)
    tree0 = init_tree(game, positions, R, stat_dtype=stat_dtype)

    def search(t, k):
        return run_mcts(game, apply_inference, params, t, k,
                        rollouts=R, cpuct=1.5, training=True)

    assert K.select_supported(G, R, game.max_actions), name
    tree_k, pol_k = jax.device_get(jax.jit(search)(tree0, jax.random.key(1)))

    orig = K.select_supported
    K.select_supported = lambda *a, **kw: False
    try:
        tree_j, pol_j = jax.device_get(
            jax.jit(search)(tree0, jax.random.key(1))
        )
    finally:
        K.select_supported = orig

    print(f"--- {name} (A={game.max_actions}, "
          f"stats={jnp.dtype(stat_dtype).name}) ---")
    for field in ("parent", "action_from", "expanded", "next_idx",
                  "visits"):
        a, b = getattr(tree_k, field), getattr(tree_j, field)
        print(f"  {field:12s} equal: "
              f"{np.array_equal(np.asarray(a), np.asarray(b))}")
    f32 = np.float32
    print(f"  wsum maxdiff:   "
          f"{np.abs(np.asarray(tree_k.wsum, f32) - np.asarray(tree_j.wsum, f32)).max()}")
    print(f"  prior maxdiff:  "
          f"{np.abs(np.asarray(tree_k.prior, f32) - np.asarray(tree_j.prior, f32)).max()}")
    print(f"  rootpi maxdiff: {np.abs(pol_k - pol_j).max()}")


if __name__ == "__main__":
    check("connect4")       # A=7, narrow
    check("reversi6x6")     # A=37, pass action
    check("hex7")           # A=49, wide block path
    check("hex13", G=256)   # A=169, widest board (> 128 sublanes)
    # bf16 stat storage (the production default, tree.stat_dtype_for):
    # kernel and jnp twin round at identical points, so parity stays
    # bit-exact in bf16 too
    check("connect4", stat_dtype=jnp.bfloat16)
    check("hex7", stat_dtype=jnp.bfloat16)
    check("hex13", G=256, stat_dtype=jnp.bfloat16)
