"""Phase-level timing of one MCTS rollout's components on the real chip."""
import time
import jax, jax.numpy as jnp

from alphatpu.games import make_game
from alphatpu.mcts.search import (
    backup, descend, expand, leaf_positions, refresh_policies, run_mcts,
)
from alphatpu.mcts.tree import init_tree, node_onehot
from alphatpu.mcts.newton import regularized_policy
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import broadcast_initial

G, R = 16384, 64
game = make_game("connect4")
params = init_params(jax.random.key(0), config_for_game(game))
positions = broadcast_initial(game, G)
tree0 = init_tree(game, positions, R)

# build a "mid-search" tree: run 32 rollouts first so phases see realistic state
warm = jax.jit(lambda t, k: run_mcts(game, apply_inference, params, t, k,
                                     rollouts=32, cpuct=1.5, training=True)[0])
tree = warm(tree0, jax.random.key(1))
jax.block_until_ready(tree.q)
# mark some nodes stale so refresh has realistic work
tree = tree._replace(uptodate=tree.uptodate & (tree.visits.sum(0) < 2.0))

D = min(game.max_game_length, R)
probs = jax.random.uniform(jax.random.key(2), (D, G))


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:32s} {dt:8.2f} ms")
    return out


# refresh (Newton over all stale nodes)
j_ref = jax.jit(lambda t: refresh_policies(t, 1.5))
tree_r = timeit("refresh (Newton all nodes)", j_ref, tree)

# descend
j_desc = jax.jit(lambda t, p: descend(game, t, p))
path, node, leaf_action, needs_alloc = timeit("descend (full)", j_desc, tree_r, probs)

# leaf states + NN forward
def nn_fwd(t, node, leaf_action, needs_alloc):
    st = leaf_positions(game, t, node, leaf_action, needs_alloc)
    enc = jax.vmap(game.encode)(st)
    logits, v = apply_inference(params, enc)
    return st, jax.nn.softmax(logits, -1).T, v

j_nn = jax.jit(nn_fwd)
leaf_states, prior, v = timeit("leafpos+encode+NN fwd", j_nn, tree_r, node,
                               leaf_action, needs_alloc)

# expand
j_exp = jax.jit(lambda t, n_, a, na, ls, p: expand(game, t, n_, a, na, ls, p, True))
tree3, leaf, done, result = timeit("expand", j_exp, tree_r, node, leaf_action,
                                   needs_alloc, leaf_states, prior)

# backup
j_bk = jax.jit(lambda t, pa, lp, v, d, r: backup(t, pa, lp, v, d, r))
_ = timeit("backup", j_bk, tree3, path, leaf_states.player, v, done, result)

# newton alone at [A, G]
q = tree.q[:, 1]; pr = tree.prior[:, 1]; vi = tree.visits[:, 1]
j_newt = jax.jit(lambda p, q, v: regularized_policy(p, q, v, 1.5))
_ = timeit("newton [A,G] single node", j_newt, pr, q, vi)

# whole rollout via scan of 1
j_roll = jax.jit(lambda t, k: run_mcts(game, apply_inference, params, t, k,
                                       rollouts=1, cpuct=1.5, training=True)[0])
_ = timeit("full 1-rollout run_mcts", j_roll, tree, jax.random.key(3))

# 64-rollout full search (per-move cost in selfplay)
j_full = jax.jit(lambda t, k: run_mcts(game, apply_inference, params, t, k,
                                       rollouts=64, cpuct=1.5, training=True)[0])
_ = timeit("full 64-rollout search", j_full, tree0, jax.random.key(4), n=3)
