"""Honest (device_get-synced) ablation of the rollout body.

Env knobs: GAME (default connect4), G (default 16384), R (default 64).
"""
import os
import time
import jax, jax.numpy as jnp

from alphatpu.games import make_game
from alphatpu.mcts import search as S
from alphatpu.mcts.tree import init_tree
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import broadcast_initial

G = int(os.environ.get("G", 16384))
R = int(os.environ.get("R", 64))
game = make_game(os.environ.get("GAME", "connect4"))
print(f"game={game.name} G={G} R={R} A={game.max_actions}", flush=True)
params = init_params(jax.random.key(0), config_for_game(game))
positions = broadcast_initial(game, G)
tree0 = init_tree(game, positions, R)
depth_cap = min(game.max_game_length, R)


def make_variant(do_select=True, do_backup=True, use_nn=True, do_expand=True):
    def run(tree, rng):
        keys = jax.random.split(rng, R)

        def body(tree, k):
            p = jax.random.uniform(k, (depth_cap, G))
            if do_select:
                path, node, leaf_action, needs_alloc, root_pi = S.select(
                    game, tree, p, 1.5)
            else:
                node = jnp.zeros((G,), jnp.int32)
                leaf_action = (p[0] * game.max_actions).astype(jnp.int32)
                needs_alloc = jnp.ones((G,), bool)
                path = S.Path(
                    jnp.zeros((depth_cap, G), jnp.int32).at[1:].set(-1),
                    jnp.zeros((depth_cap, G), jnp.int32),
                    jnp.ones((G,), jnp.int32),
                )
            leaf_states = S.leaf_positions(game, tree, node, leaf_action,
                                           needs_alloc)
            if use_nn:
                enc = jax.vmap(game.encode)(leaf_states)
                logits, v = apply_inference(params, enc)
                prior = jax.nn.softmax(logits, axis=-1).T
            else:
                prior = jnp.full((game.max_actions, G), 1.0 / game.max_actions)
                v = jnp.full((G,), 0.5)
            if do_expand:
                tree, leaf, done, result, _newp = S.expand(
                    game, tree, node, leaf_action, needs_alloc, leaf_states,
                    prior, True)
            else:
                done, result = jax.vmap(game.is_over)(leaf_states)
            if do_backup:
                tree = S.backup(tree, path, leaf_states.player, v, done, result)
            return tree, None

        tree, _ = jax.lax.scan(body, tree, keys)
        return tree.prior[:, 0]

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
timeit("no-select", make_variant(do_select=False))
timeit("no-backup", make_variant(do_backup=False))
timeit("no-nn", make_variant(use_nn=False))
timeit("no-expand", make_variant(do_expand=False))
timeit("select-only", make_variant(do_backup=False, use_nn=False,
                                   do_expand=False))
