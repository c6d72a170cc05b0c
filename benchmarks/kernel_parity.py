"""On-TPU parity of the Pallas select/backup kernels vs the jnp reference.

Runs a full 32-rollout search twice on the same tree and RNG - once through
the kernel path (as shipped) and once forcing the jnp fallback - and
compares the resulting trees and root policies.
"""
import jax, jax.numpy as jnp
import numpy as np

import alphatpu.mcts.pallas_kernels as K
from alphatpu.games import make_game
from alphatpu.mcts.search import run_mcts
from alphatpu.mcts.tree import init_tree
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import broadcast_initial

G, R = 1024, 32
game = make_game("connect4")
params = init_params(jax.random.key(0), config_for_game(game, width=64, depth=2))
positions = broadcast_initial(game, G)
tree0 = init_tree(game, positions, R)

run = jax.jit(lambda t, k: run_mcts(game, apply_inference, params, t, k,
                                    rollouts=R, cpuct=1.5, training=True))

tree_k, pol_k = jax.device_get(run(tree0, jax.random.key(1)))

orig = K.select_supported
K.select_supported = lambda *a, **kw: False
run2 = jax.jit(lambda t, k: run_mcts(game, apply_inference, params, t, k,
                                     rollouts=R, cpuct=1.5, training=True))
tree_j, pol_j = jax.device_get(run2(tree0, jax.random.key(1)))
K.select_supported = orig

for name in ("parent", "action_from", "expanded", "child", "next_idx",
             "visits"):
    a, b = getattr(tree_k, name), getattr(tree_j, name)
    ok = np.array_equal(np.asarray(a), np.asarray(b))
    print(f"{name:12s} equal: {ok}")
print("wsum maxdiff:", np.abs(tree_k.wsum - tree_j.wsum).max())
print("prior maxdiff:", np.abs(tree_k.prior - tree_j.prior).max())
print("rootpi maxdiff:", np.abs(pol_k - pol_j).max())
