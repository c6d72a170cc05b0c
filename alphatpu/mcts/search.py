"""Batched MCTS phases: policy refresh / descend / expand / backup.

TPU-native re-design of the reference's GPU kernels.  The reference runs one
CUDA thread per game with divergent control flow (mcts_gpu.jl:100-199); TPUs
have no per-lane divergence, so each phase is a *lockstep* array program over
all games with active-lane masking, in the games-minor layout of
:mod:`alphatpu.mcts.tree` (G fills the VPU lanes).

Phase structure per rollout (a restructuring of the reference's
descend/expand/backup for array hardware - identical semantics, very
different data movement):

* **refresh**: the regularized-policy Newton solve (the reference's stated
  bottleneck, README.md:81) runs ONCE per rollout for every stale node
  simultaneously - ``[A, V*G]`` lanes - instead of per depth-step inside
  the walk (kdescendTree!, mcts_gpu.jl:114-169).  Identical results: a
  stale node's (prior, q, visits) only change via backup, which re-marks
  it stale, so refreshing early computes exactly what the reference's
  lazy in-walk recompute would.
* **descend**: a READ-ONLY ``lax.while_loop`` over tree depth - all games
  step one edge per iteration until every game hits an unexpanded node or
  a missing edge (mcts_gpu.jl:170-195).  The traversed path is recorded as
  ``[D, G]`` edge lists; no tree mutation per depth step.
* **expand**: allocates at most one node per game (the reference allocates
  inside the walk, mcts_gpu.jl:183-191 - same ids, same order), then one
  batched legal-mask + prior write (mcts_gpu.jl:250-302),
* **backup**: walks the RECORDED path (not parent pointers) updating each
  edge's (q, visits) with the parity-flipped leaf value - pure elementwise
  masked updates, no gathers (backUp, mcts_gpu.jl:306-328).
* the rollout loop is a ``lax.scan``; the NN evaluates all G leaves in one
  in-graph batch-major forward per rollout (mcts_gpu.jl:396-439) - no host
  syncs anywhere.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .newton import cdf_sample, regularized_policy
from .tree import (
    Tree,
    gather_node,
    gather_stat,
    gather_states,
    node_onehot,
    scatter_node,
    scatter_stat,
    scatter_states,
)


def refresh_policies(tree: Tree, cpuct) -> Tree:
    """Recompute the regularized policy for every stale node in one batched
    Newton solve (lanes = all (node, game) pairs), then mark everything
    up to date.  Matches the reference's lazy per-visit recompute
    (mcts_gpu.jl:114-169) because stats can't change between the backup
    that staled a node and its next traversal.

    On TPU with a lane-aligned batch the solve runs as a VMEM-resident
    Pallas kernel (the iteration loop costs no HBM traffic); the pure-jnp
    path is the fallback and the numerical reference."""
    from .pallas_kernels import refresh_policies_pallas, refresh_supported

    stale = tree.expanded & ~tree.uptodate  # [V, G]
    if refresh_supported(tree.num_games, tree.num_nodes):
        policy = refresh_policies_pallas(
            tree.prior, tree.q, tree.visits, tree.policy, stale, float(cpuct)
        )
    else:
        # stats are action-major [A, V, G]: the solve reduces over axis 0
        # with no data movement.
        pi = regularized_policy(tree.prior, tree.q, tree.visits, cpuct)
        policy = jnp.where(stale[None], pi, tree.policy)
    return tree._replace(
        policy=policy, uptodate=jnp.ones_like(tree.uptodate)
    )


class Path(NamedTuple):
    """Edges traversed this rollout: entry d is the edge taken at depth d
    (-1 node id = lane recorded nothing at that depth)."""

    nodes: jnp.ndarray  # i32[D, G]
    actions: jnp.ndarray  # i32[D, G]
    length: jnp.ndarray  # i32[G] - number of recorded edges


def descend(game, tree: Tree, probs):
    """Walk every game from its root to a leaf following the (pre-refreshed)
    stored policies.  Read-only over the tree.

    ``probs``: f32[D, G] pre-drawn uniforms, indexed by depth - mirroring the
    reference's per-rollout ``CUDA.rand(maxLengthGame, L)`` draw
    (mcts_gpu.jl:397) and enabling exact-stream injection in tests.

    Returns ``(path, leaf_node, leaf_parent, leaf_action, needs_alloc)``:
    * ``needs_alloc`` lanes sampled an edge with no child yet - the leaf is
      the to-be-allocated node under (leaf_parent, leaf_action),
    * other lanes stopped at the existing unexpanded node ``leaf_node``.
    """
    V = tree.num_nodes
    A = tree.num_actions
    G = tree.num_games
    max_depth = probs.shape[0]
    act_ids = jnp.arange(A)[:, None]  # [A, 1]

    def cond(st):
        _, found, depth, *_ = st
        return jnp.any(~found) & (depth < max_depth)

    def body(st):
        node, found, depth, leaf_action, needs_alloc, pnodes, pactions = st
        oh = node_onehot(V, node)  # [V, G]
        exp = gather_node(tree.expanded, oh)  # [G]
        live = ~found & exp  # lanes stepping one edge now
        pi = gather_stat(tree.policy, oh)  # [A, G]
        action = cdf_sample(pi, probs[depth])  # [G]
        pnodes = pnodes.at[depth].set(jnp.where(live, node, -1))
        pactions = pactions.at[depth].set(action)
        cid = (gather_stat(tree.child, oh) * (act_ids == action[None])).sum(0)
        hit_missing = live & (cid == 0)
        leaf_action = jnp.where(hit_missing, action, leaf_action)
        needs_alloc = needs_alloc | hit_missing
        found = found | ~exp | hit_missing
        node = jnp.where(live & (cid > 0), cid, node)
        return node, found, depth + 1, leaf_action, needs_alloc, pnodes, pactions

    node0 = jnp.zeros((G,), jnp.int32)
    init = (
        node0,
        jnp.zeros((G,), bool),
        jnp.int32(0),
        jnp.zeros((G,), jnp.int32),
        jnp.zeros((G,), bool),
        jnp.full((max_depth, G), -1, jnp.int32),
        jnp.zeros((max_depth, G), jnp.int32),
    )
    node, _, _, leaf_action, needs_alloc, pnodes, pactions = (
        jax.lax.while_loop(cond, body, init)
    )
    path = Path(pnodes, pactions, (pnodes >= 0).sum(0).astype(jnp.int32))
    # node is the final position: the unexpanded leaf itself, or the parent
    # of the to-be-allocated child.
    return path, node, leaf_action, needs_alloc


def leaf_positions(game, tree: Tree, node, leaf_action, needs_alloc):
    """Batch-layout states the NN will evaluate: the stored state at the
    existing leaf, or play(parent_state, action) for lanes allocating a new
    child (the reference plays on-device at allocation, mcts_gpu.jl:186)."""
    oh = node_onehot(tree.num_nodes, node)
    state = gather_states(tree.states, oh)  # [G, *S]
    played = jax.vmap(game.play)(state, leaf_action)
    return jax.tree.map(
        lambda ex, pl: jnp.where(
            needs_alloc.reshape((-1,) + (1,) * (pl.ndim - 1)), pl, ex
        ),
        state,
        played,
    )


def expand(game, tree: Tree, node, leaf_action, needs_alloc, leaf_states,
           prior_nn, training: bool):
    """Allocate the new children (same ids and order as the reference's
    in-walk `newindex` counter, mcts_gpu.jl:184), then write masked,
    normalized priors at each game's leaf; at the root during training mix
    0.75 * p + 0.25 * uniform-over-legal - the hard-coded exploration mix of
    the reference (mcts_gpu.jl:270-280; NB the CLI ``--noise`` flag is dead
    there, the 25% mix is baked in).  Terminal leaves keep zero priors and
    get expanded = False (mcts_gpu.jl:255-257).

    ``prior_nn``: [A, G].  Returns (tree, leaf, done, result).
    """
    V = tree.num_nodes
    A = tree.num_actions
    act_ids = jnp.arange(A)[:, None]

    new = tree.next_idx
    slot_oh = node_onehot(V, new) & needs_alloc[None, :]
    parent_oh = node_onehot(V, node)
    act_oh = act_ids == leaf_action[None, :]  # [A, G]
    tree = tree._replace(
        parent=scatter_node(tree.parent, slot_oh, node),
        action_from=scatter_node(tree.action_from, slot_oh, leaf_action),
        states=scatter_states(tree.states, slot_oh, leaf_states),
        child=jnp.where(
            act_oh[:, None, :] & parent_oh[None] & needs_alloc[None, None, :],
            new[None, None, :],
            tree.child,
        ),
        next_idx=tree.next_idx + needs_alloc.astype(jnp.int32),
    )
    leaf = jnp.where(needs_alloc, new, node)

    oh = node_onehot(V, leaf)
    done, result = jax.vmap(game.is_over)(leaf_states)
    legal = jax.vmap(game.legal_mask)(leaf_states).T  # [A, G]

    p = jnp.where(legal, prior_nn, 0.0)
    norm = jnp.maximum(p.sum(0, keepdims=True), 1e-30)
    p_norm = p / norm
    if training:
        a_cnt = jnp.maximum(legal.sum(0, keepdims=True).astype(jnp.float32), 1.0)
        mixed = 0.75 * p_norm + 0.25 / a_cnt * legal
        is_root = (leaf == 0)[None, :]
        newp = jnp.where(is_root, mixed, p_norm)
    else:
        newp = p_norm
    old = gather_stat(tree.prior, oh)
    newp = jnp.where(done[None, :], old, newp)

    tree = tree._replace(
        expanded=scatter_node(tree.expanded, oh, ~done),
        prior=scatter_stat(tree.prior, oh, newp),
        # expand copies prior -> policy for the first traversal
        # (mcts_gpu.jl:297-299).
        policy=scatter_stat(tree.policy, oh, newp),
    )
    return tree, leaf, done, result


def backup(tree: Tree, path: Path, leaf_player, value_nn, done, result):
    """Update every edge on the recorded path: per edge q <- running mean of
    the parity-flipped leaf value, visits += 1, path nodes marked stale
    (backUp, mcts_gpu.jl:306-328).  The edge at depth d (leaf edge =
    depth len-1) receives ``1 - flip^(len-1-d)(leaf_value)``; since all
    path edges are distinct tree edges, every update is an independent
    masked elementwise op - no gathers, no parent-pointer chasing.

    On TPU the walk runs as a VMEM-resident Pallas kernel (one HBM
    read/write of the stats per rollout instead of one per depth step);
    the jnp while_loop below is the fallback and numerical reference."""
    from .pallas_kernels import backup_pallas, refresh_supported

    V = tree.num_nodes
    A = tree.num_actions
    act_ids = jnp.arange(A)[:, None]
    leaf_value = jnp.where(
        done,
        (1.0 + leaf_player.astype(jnp.float32) * result.astype(jnp.float32))
        / 2.0,
        value_nn,
    )
    if refresh_supported(tree.num_games, tree.num_nodes):
        q, visits, uptodate = backup_pallas(
            tree.q, tree.visits, tree.uptodate,
            path.nodes, path.actions, path.length, leaf_value,
        )
        return tree._replace(q=q, visits=visits, uptodate=uptodate)

    max_len = jnp.max(path.length)

    def cond(st):
        _, d = st
        return d < max_len

    def body(st):
        tree, d = st
        nodes = path.nodes[d]
        actions = path.actions[d]
        valid = nodes >= 0
        k = path.length - 1 - d  # flips between this edge and the leaf
        contrib = jnp.where(k % 2 == 0, 1.0 - leaf_value, leaf_value)
        oh = node_onehot(V, nodes) & valid[None, :]
        edge = (act_ids == actions[None, :])[:, None, :] & oh[None]
        newq = (tree.visits * tree.q + contrib[None, None, :]) / (
            tree.visits + 1.0
        )
        tree = tree._replace(
            q=jnp.where(edge, newq, tree.q),
            visits=jnp.where(edge, tree.visits + 1.0, tree.visits),
            uptodate=tree.uptodate & ~oh,
        )
        return tree, d + 1

    tree, _ = jax.lax.while_loop(cond, body, (tree, jnp.int32(0)))
    return tree


def run_mcts(
    game,
    net_apply: Callable,
    params,
    tree: Tree,
    rng,
    *,
    rollouts: int,
    cpuct: float,
    training: bool,
    probs=None,
):
    """One full search over all games for the current move: ``rollouts`` x
    (refresh -> descend -> batched NN forward -> expand -> backup) as a
    lax.scan (the reference's host rollout loop, mcts_gpu.jl:376-462, minus
    its five per-stage device syncs).

    ``probs``: optional f32[rollouts, D, G] uniform injection for tests.
    Returns (tree, root_policy [A, G]).  The root policy is the stored policy
    after the final rollout - one rollout stale, exactly like the reference's
    `copy_pol` (mcts_gpu.jl:330-339, 443).
    """
    G = tree.num_games
    depth_cap = min(game.max_game_length, tree.num_nodes)
    if probs is None:
        keys = jax.random.split(rng, rollouts)
        xs = keys
        get_probs = lambda k: jax.random.uniform(k, (depth_cap, G))
    else:
        xs = probs
        get_probs = lambda p: p

    def body(tree, x):
        p = get_probs(x)
        tree = refresh_policies(tree, cpuct)
        path, node, leaf_action, needs_alloc = descend(game, tree, p)
        leaf_states = leaf_positions(game, tree, node, leaf_action, needs_alloc)
        enc = jax.vmap(game.encode)(leaf_states)  # [G, in] - batch-major
        logits, v = net_apply(params, enc)
        prior = jax.nn.softmax(logits, axis=-1).T  # [A, G]
        tree, leaf, done, result = expand(
            game, tree, node, leaf_action, needs_alloc, leaf_states, prior,
            training,
        )
        tree = backup(
            tree, path, leaf_states.player, v, done, result
        )
        return tree, None

    tree, _ = jax.lax.scan(body, tree, xs)
    return tree, tree.policy[:, 0]  # root policy [A, G]
