"""Honest (device_get-synced) ablation of the rollout body at G=16384."""
import time
import jax, jax.numpy as jnp

from alphatpu.games import make_game
from alphatpu.mcts import search as S
from alphatpu.mcts.tree import init_tree
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import broadcast_initial

G, R = 16384, 64
game = make_game("connect4")
params = init_params(jax.random.key(0), config_for_game(game))
positions = broadcast_initial(game, G)
tree0 = init_tree(game, positions, R)
depth_cap = min(game.max_game_length, R)


def make_variant(refresh=True, do_backup=True, use_nn=True):
    def run(tree, rng):
        keys = jax.random.split(rng, R)

        def body(tree, k):
            p = jax.random.uniform(k, (depth_cap, G))
            if refresh:
                tree = S.refresh_policies(tree, 1.5)
            path, node, leaf_action, needs_alloc = S.descend(game, tree, p)
            leaf_states = S.leaf_positions(game, tree, node, leaf_action,
                                           needs_alloc)
            if use_nn:
                enc = jax.vmap(game.encode)(leaf_states)
                logits, v = apply_inference(params, enc)
                prior = jax.nn.softmax(logits, axis=-1).T
            else:
                prior = jnp.full((game.max_actions, G), 1.0 / game.max_actions)
                v = jnp.full((G,), 0.5)
            tree, leaf, done, result = S.expand(
                game, tree, node, leaf_action, needs_alloc, leaf_states,
                prior, True)
            if do_backup:
                tree = S.backup(tree, path, leaf_states.player, v, done, result)
            return tree, None

        tree, _ = jax.lax.scan(body, tree, keys)
        return tree.policy[:, 0]

    return jax.jit(run)


def timeit(name, fn, n=5):
    out = fn(tree0, jax.random.key(1))
    jax.device_get(out[0, 0])
    t0 = time.time()
    for i in range(n):
        out = fn(tree0, jax.random.key(2 + i))
    jax.device_get(out[0, 0])
    dt = (time.time() - t0) / n * 1000
    print(f"{name:24s} {dt:8.1f} ms/move  ({dt/R:.3f} ms/rollout)", flush=True)


timeit("full", make_variant())
timeit("no-refresh", make_variant(refresh=False))
timeit("no-backup", make_variant(do_backup=False))
timeit("no-nn", make_variant(use_nn=False))
timeit("no-refresh-no-backup", make_variant(refresh=False, do_backup=False))
