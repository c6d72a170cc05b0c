"""Batched MCTS phases: descend / expand / backup, and the rollout loop.

TPU-native re-design of the reference's GPU kernels.  The reference runs one
CUDA thread per game with divergent control flow (mcts_gpu.jl:100-199); TPUs
have no per-lane divergence, so each phase is a *lockstep* array program over
all games with active-lane masking, in the games-minor layout of
:mod:`alphatpu.mcts.tree` (G fills the VPU lanes; every per-node read/write
is a fused one-hot masked op, never a serialized scatter):

* descend: a ``lax.while_loop`` over tree depth - all games step one edge per
  iteration until every game sits at an unexpanded leaf (kdescendTree!,
  mcts_gpu.jl:100-199),
* expand: one batched legal-mask + prior write (mcts_gpu.jl:250-302),
* backup: a ``lax.while_loop`` up the parent chains (mcts_gpu.jl:306-328),
* the rollout loop is a ``lax.scan``; the NN evaluates all G leaves in one
  in-graph batch-major forward per rollout (mcts_gpu.jl:396-439) - no host
  syncs anywhere.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .newton import cdf_sample, regularized_policy
from .tree import (
    Tree,
    gather_node,
    gather_states,
    node_onehot,
    scatter_node,
    scatter_states,
)


def descend(game, tree: Tree, probs, cpuct):
    """Walk every game from its root to an unexpanded leaf, lazily allocating
    at most one child per game, and return (tree, leaf_indices [G]).

    ``probs``: f32[D, G] pre-drawn uniforms, indexed by depth - mirroring the
    reference's per-rollout ``CUDA.rand(maxLengthGame, L)`` draw
    (mcts_gpu.jl:397) and enabling exact-stream injection in tests.
    """
    V = tree.num_nodes
    A = tree.num_actions
    G = tree.num_games
    max_depth = probs.shape[0]
    act_ids = jnp.arange(A)[:, None]  # [A, 1]

    def cond(st):
        tree, node, depth = st
        oh = node_onehot(V, node)
        return jnp.any(gather_node(tree.expanded, oh)) & (depth < max_depth)

    def body(st):
        tree, node, depth = st
        prob = probs[depth]
        oh = node_onehot(V, node)  # [V, G]
        active = gather_node(tree.expanded, oh)  # [G]
        utd = gather_node(tree.uptodate, oh)
        prior = gather_node(tree.prior, oh)  # [A, G]
        q = gather_node(tree.q, oh)
        visits = gather_node(tree.visits, oh)
        stored_pi = gather_node(tree.policy, oh)

        # Recompute the regularized policy where stats went stale since the
        # last traversal (mcts_gpu.jl:114-169); first traversals reuse the
        # stored policy (= prior right after expansion).
        pi_new = regularized_policy(prior, q, visits, cpuct)
        pi = jnp.where(utd[None, :], stored_pi, pi_new)
        refresh = active & ~utd
        tree = tree._replace(
            policy=scatter_node(tree.policy, oh, pi, refresh),
            # Pure optimization over the reference (which recomputes every
            # traversal): stats only change via backup, which re-marks stale.
            uptodate=scatter_node(
                tree.uptodate, oh, jnp.ones((G,), bool), refresh
            ),
        )

        action = cdf_sample(pi, prob)  # [G]
        act_oh = act_ids == action[None, :]  # [A, G]

        # Lazy child allocation (mcts_gpu.jl:183-191).
        cid = gather_node(tree.child, oh) * act_oh
        cid = cid.sum(0)  # [G] - child id at (node, action), 0 = none
        need = active & (cid == 0)
        new = tree.next_idx
        slot_oh = node_onehot(V, new) & need[None, :]  # masked slot one-hot
        cur_state = gather_states(tree.states, oh)
        new_state = jax.vmap(game.play)(cur_state, action)

        tree = tree._replace(
            parent=scatter_node(tree.parent, slot_oh, node),
            action_from=scatter_node(tree.action_from, slot_oh, action),
            states=scatter_states(tree.states, slot_oh, new_state),
            child=jnp.where(
                (oh[:, None, :] & act_oh[None] & need[None, None, :]),
                new[None, None, :],
                tree.child,
            ),
            next_idx=tree.next_idx + need.astype(jnp.int32),
        )
        cid = jnp.where(need, new, cid)
        node = jnp.where(active, cid, node)
        return tree, node, depth + 1

    node0 = jnp.zeros((G,), jnp.int32)
    tree, leaf, _ = jax.lax.while_loop(cond, body, (tree, node0, jnp.int32(0)))
    return tree, leaf


def expand(game, tree: Tree, leaf, prior_nn, training: bool):
    """Write masked, normalized priors at each game's leaf; at the root
    during training mix 0.75 * p + 0.25 * uniform-over-legal - the hard-coded
    exploration mix of the reference (mcts_gpu.jl:270-280; NB the CLI
    ``--noise`` flag is dead there, the 25% mix is baked in).  Terminal
    leaves keep zero priors and get expanded = False (mcts_gpu.jl:255-257).

    ``prior_nn``: [A, G].  Returns (tree, done, result) so backup can reuse
    the terminal check (identical values; the reference recomputes isOver
    in backUp).
    """
    V = tree.num_nodes
    oh = node_onehot(V, leaf)
    leaf_state = gather_states(tree.states, oh)
    done, result = jax.vmap(game.is_over)(leaf_state)
    legal = jax.vmap(game.legal_mask)(leaf_state).T  # [A, G]

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
    old = gather_node(tree.prior, oh)
    newp = jnp.where(done[None, :], old, newp)

    tree = tree._replace(
        expanded=scatter_node(tree.expanded, oh, ~done),
        prior=scatter_node(tree.prior, oh, newp),
        # expand copies prior -> policy for the first traversal
        # (mcts_gpu.jl:297-299).
        policy=scatter_node(tree.policy, oh, newp),
    )
    return tree, done, result


def backup(game, tree: Tree, leaf, value_nn, done, result):
    """Propagate the leaf value up the parent chain: per edge
    q <- running mean of (1 - value), visits += 1, value flips each ply,
    ancestors marked stale (mcts_gpu.jl:306-328)."""
    V = tree.num_nodes
    A = tree.num_actions
    act_ids = jnp.arange(A)[:, None]
    leaf_oh = node_onehot(V, leaf)
    leaf_player = gather_node(
        tree.states.player, leaf_oh
    ).astype(jnp.float32)
    value = jnp.where(
        done,
        (1.0 + leaf_player * result.astype(jnp.float32)) / 2.0,
        value_nn,
    )
    node = gather_node(tree.parent, leaf_oh)
    move = gather_node(tree.action_from, leaf_oh)

    def cond(st):
        _, node, _, _ = st
        return jnp.any(node >= 0)

    def body(st):
        tree, node, move, value = st
        act = node >= 0
        oh = node_onehot(V, node) & act[None, :]  # [V, G]
        move_oh = act_ids == move[None, :]  # [A, G]
        edge = oh[:, None, :] & move_oh[None]  # [V, A, G]
        qv = jnp.where(edge, tree.q, 0.0).sum((0, 1))
        vi = jnp.where(edge, tree.visits, 0.0).sum((0, 1))
        newq = (vi * qv + (1.0 - value)) / (vi + 1.0)
        tree = tree._replace(
            q=jnp.where(edge, newq[None, None, :], tree.q),
            visits=jnp.where(edge, tree.visits + 1.0, tree.visits),
            uptodate=tree.uptodate & ~oh,
        )
        nxt_move = gather_node(tree.action_from, oh)
        nxt_node = gather_node(tree.parent, oh)
        move = jnp.where(act, nxt_move, move)
        node = jnp.where(act, nxt_node, node)
        value = jnp.where(act, 1.0 - value, value)
        return tree, node, move, value

    tree, _, _, _ = jax.lax.while_loop(cond, body, (tree, node, move, value))
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
    (descend -> batched NN forward -> expand -> backup) as a lax.scan
    (the reference's host rollout loop, mcts_gpu.jl:376-462, minus its five
    per-stage device syncs).

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
        tree, leaf = descend(game, tree, p, cpuct)
        leaf_states = gather_states(
            tree.states, node_onehot(tree.num_nodes, leaf)
        )
        enc = jax.vmap(game.encode)(leaf_states)  # [G, in] - batch-major
        logits, v = net_apply(params, enc)
        prior = jax.nn.softmax(logits, axis=-1).T  # [A, G]
        tree, done, result = expand(game, tree, leaf, prior, training)
        tree = backup(game, tree, leaf, v, done, result)
        return tree, None

    tree, _ = jax.lax.scan(body, tree, xs)
    return tree, tree.policy[0]
