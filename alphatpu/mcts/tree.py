"""Array-resident MCTS tree storage (struct-of-arrays over [games, nodes]).

TPU-native re-design of the reference's per-batch node pools
(mcts_gpu.jl:35-51): every field is a dense device array with leading axes
``[G, V]`` (G = games, V = node capacity = rollouts per move), so the whole
tree lives in HBM and every search phase is a batched array program.

Differences from the reference layout, by design:
* ``childID [V, V, G]`` + ``Achild`` + ``childnbr`` (the O(V^2) indirection,
  mcts_gpu.jl:38) collapse into one ``child [G, V, A]`` index array
  (0 = no child; the root is node 0 and can never be a child).
* node ids are 0-based; a null parent is -1 (the reference uses 1-based ids
  with 0 as null, mcts_gpu.jl:318).
* per-node game states are stored as the game's state pytree stacked over
  [G, V] instead of an array of isbits structs.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class Tree(NamedTuple):
    parent: jnp.ndarray  # i32[G, V], -1 = none
    action_from: jnp.ndarray  # i32[G, V]
    expanded: jnp.ndarray  # bool[G, V]
    uptodate: jnp.ndarray  # bool[G, V]
    states: Any  # game-state pytree, leaves [G, V, ...]
    prior: jnp.ndarray  # f32[G, V, A]
    policy: jnp.ndarray  # f32[G, V, A]
    q: jnp.ndarray  # f32[G, V, A]
    visits: jnp.ndarray  # f32[G, V, A]
    child: jnp.ndarray  # i32[G, V, A], 0 = none
    next_idx: jnp.ndarray  # i32[G] - next free node slot

    @property
    def num_games(self) -> int:
        return self.parent.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.parent.shape[1]

    @property
    def num_actions(self) -> int:
        return self.prior.shape[2]


def init_tree(game, positions, num_nodes: int) -> Tree:
    """Allocate a tree pool with ``positions`` (a batched state pytree with
    leading axis [G]) installed as the roots (reference `init`/`create_roots`,
    mcts_gpu.jl:42-53, 342-357)."""
    player = positions.player
    G = player.shape[0]
    V = num_nodes
    A = game.max_actions

    def alloc_state(leaf):
        out = jnp.zeros((G, V) + leaf.shape[1:], leaf.dtype)
        return out.at[:, 0].set(leaf)

    return Tree(
        parent=jnp.full((G, V), -1, jnp.int32),
        action_from=jnp.zeros((G, V), jnp.int32),
        expanded=jnp.zeros((G, V), bool),
        uptodate=jnp.ones((G, V), bool),
        states=jax.tree.map(alloc_state, positions),
        prior=jnp.zeros((G, V, A), jnp.float32),
        policy=jnp.zeros((G, V, A), jnp.float32),
        q=jnp.zeros((G, V, A), jnp.float32),
        visits=jnp.zeros((G, V, A), jnp.float32),
        child=jnp.zeros((G, V, A), jnp.int32),
        next_idx=jnp.ones((G,), jnp.int32),
    )


def reset_tree(tree: Tree, positions) -> Tree:
    """Recycle the pool for the next move: zero all stats, install the new
    roots, mark everything unexpanded/up-to-date (reference `re_init` +
    the stat zeroing at the top of `mcts_single`, mcts_gpu.jl:368-373,
    380-387)."""

    def reset_state(leaf, pos_leaf):
        return jnp.zeros_like(leaf).at[:, 0].set(pos_leaf)

    return Tree(
        parent=jnp.full_like(tree.parent, -1),
        action_from=jnp.zeros_like(tree.action_from),
        expanded=jnp.zeros_like(tree.expanded),
        uptodate=jnp.ones_like(tree.uptodate),
        states=jax.tree.map(reset_state, tree.states, positions),
        prior=jnp.zeros_like(tree.prior),
        policy=jnp.zeros_like(tree.policy),
        q=jnp.zeros_like(tree.q),
        visits=jnp.zeros_like(tree.visits),
        child=jnp.zeros_like(tree.child),
        next_idx=jnp.ones_like(tree.next_idx),
    )


# ---- batched gather/scatter over the node axis ----


def gather_node(arr: jnp.ndarray, node: jnp.ndarray) -> jnp.ndarray:
    """arr [G, V, ...] indexed per game by node [G] -> [G, ...]."""
    idx = node.reshape((-1,) + (1,) * (arr.ndim - 1))
    return jnp.take_along_axis(arr, idx, axis=1).squeeze(1)


def gather_states(states, node: jnp.ndarray):
    return jax.tree.map(lambda leaf: gather_node(leaf, node), states)


def scatter_node(arr: jnp.ndarray, node: jnp.ndarray, val, mask) -> jnp.ndarray:
    """Set arr[g, node[g]] = val[g] where mask[g]; masked lanes scatter
    out-of-bounds and are dropped."""
    G, V = arr.shape[:2]
    idx = jnp.where(mask, node, V)
    return arr.at[jnp.arange(G), idx].set(val, mode="drop")
