"""Pallas TPU kernels for the MCTS hot paths.

Two kernels cover the whole per-rollout tree work:

* **select** fuses the regularized-policy Newton solve - the reference's
  stated bottleneck (README.md:81; kdescendTree!, mcts_gpu.jl:114-169) -
  with the root-to-leaf walk.  The policy is computed *on the fly* per
  depth step from the gathered (prior, value-sum, visits) rows of the
  current node, so no policy cache exists at all (see search.py for the
  exact-equivalence argument).  The jnp pipeline streams the [A, V, G]
  stats from HBM once per depth step; here the whole walk costs one HBM
  read of the stats per rollout, and the per-depth Newton solves run on
  [1, Gb] rows that never leave vector registers.
* **backup** applies every recorded path edge's (value-sum, visits)
  multiply-add with the stat blocks VMEM-resident (backUp,
  mcts_gpu.jl:306-328) - one HBM read + write per rollout regardless of
  path length.

Numerics are identical to the jnp reference in
:mod:`alphatpu.mcts.search` / :mod:`alphatpu.mcts.newton`: same alpha init
with the 1e-4 gap floor (mcts_gpu.jl:136), same latched convergence rule
(err < 1e-3 or repeated err), same iteration cap, same CDF sampling walk.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .newton import ALPHA_FLOOR, NEWTON_CHUNK, NEWTON_MAX_CHUNKS, NEWTON_TOL

# f32 lane tile is (8, 128): G blocks must be multiples of 128.  256 lanes
# for small action spaces; 128 for wide boards (Gobang/Hex/Reversi8) whose
# [A, V, Gb] stat blocks are A-times larger.
_VMEM_LIMIT = 100 * 1024 * 1024  # Mosaic default is 16 MB; v5e has 128 MB


def games_block(num_actions: int) -> int:
    return 256 if num_actions <= 16 else 128


def _narrow(num_actions: int) -> bool:
    """Narrow action spaces keep per-action [V, Gb] values live in vector
    registers / scoped stack; wide boards (A up to 169) must stream from the
    VMEM-resident refs instead or they blow the scoped-vmem budget."""
    return num_actions <= 16


def _compiler_params(num_actions: int):
    # Only wide boards need the raised scoped-vmem ceiling; the default
    # 16 MB budget compiles measurably better schedules for narrow games.
    if _narrow(num_actions):
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def select_supported(num_games: int, num_nodes: int, num_actions: int) -> bool:
    """The kernel path needs a TPU backend (the axon tunnel platform is a
    TPU), tile-aligned dims (G on the 128 lanes, V on the 8 sublanes) and
    stat blocks that fit VMEM."""
    backend = jax.default_backend()
    gb = games_block(num_actions)
    # 4 stat blocks, double-buffered in/out, f32 - stay under the limit
    block_bytes = num_actions * num_nodes * gb * 4
    return (
        backend in ("tpu", "axon")
        and num_games % gb == 0
        and num_nodes % 8 == 0
        and 10 * block_bytes < _VMEM_LIMIT
    )


# ---------------------------------------------------------------------------
# select (fused on-the-fly regularized policy + descend)
# ---------------------------------------------------------------------------


def _node_policy_rows(p_a, w_a, v_a, *, cpuct, num_actions):
    """Regularized policy for one gathered node row per lane.  All inputs
    are length-A lists of [1, Gb] tiles; returns the same.  Matches
    newton.regularized_policy + the fresh-node prior shortcut
    (search.node_policy) bit for bit: same alpha init, same latched
    convergence, same iteration cap."""
    A = num_actions
    q_a = [jnp.where(v > 0, w / v, 0.0) for w, v in zip(w_a, v_a)]
    nvis = sum(v_a)
    n = 1.0 + nvis
    acts = sum((p > 0).astype(jnp.float32) for p in p_a)
    lam = cpuct * jnp.sqrt(n) / (acts + n)
    top_a = [lam * p for p in p_a]
    alpha = q_a[0] + jnp.maximum(top_a[0], ALPHA_FLOOR)
    for a in range(1, A):
        alpha = jnp.maximum(alpha, q_a[a] + jnp.maximum(top_a[a], ALPHA_FLOOR))

    def nstep(st):
        alpha, prev_err, conv = st
        s = jnp.zeros_like(alpha)
        grad = jnp.zeros_like(alpha)
        for a in range(A):
            bot = alpha - q_a[a]
            frac = top_a[a] / bot
            s = s + frac
            grad = grad - frac / bot
        err = s - 1.0
        now_conv = (err < NEWTON_TOL) | (err == prev_err)
        conv = jnp.maximum(conv, now_conv.astype(jnp.float32))
        delta = err / jnp.where(grad == 0, 1.0, grad)
        done = conv > 0.5
        alpha = jnp.where(done, alpha, alpha - delta)
        prev_err = jnp.where(done, prev_err, err)
        return alpha, prev_err, conv

    def ncond(st):
        (_, _, conv), j = st
        return jnp.logical_and(j < NEWTON_MAX_CHUNKS, jnp.min(conv) < 0.5)

    def nbody(st):
        inner, j = st
        for _ in range(NEWTON_CHUNK):  # static unroll, all in registers
            inner = nstep(inner)
        return inner, j + 1

    fresh = (nvis == 0.0).astype(jnp.float32)  # [1, Gb]
    # fresh lanes skip the solve entirely (start converged)
    ninit = (alpha, jnp.full_like(alpha, jnp.inf), fresh)
    (alpha, _, _), _ = jax.lax.while_loop(ncond, nbody, (ninit, jnp.int32(0)))
    out = []
    for a in range(A):
        pi = top_a[a] / (alpha - q_a[a])
        out.append(jnp.where(fresh > 0.5, p_a[a], pi))
    return out


def _select_kernel(prior_ref, wsum_ref, visits_ref, child_ref, expanded_ref,
                   probs_ref,
                   nodes_out, actions_out, leaf_out, laction_out, alloc_out,
                   rootpi_out, *, cpuct, num_actions, max_depth):
    A = num_actions
    V = prior_ref.shape[1]
    Gb = prior_ref.shape[2]
    expanded = expanded_ref[:] != 0  # [V, Gb]
    if _narrow(A):  # registers for narrow games, ref streams for wide ones
        prior_s = [prior_ref[a] for a in range(A)]
        wsum_s = [wsum_ref[a] for a in range(A)]
        visits_s = [visits_ref[a] for a in range(A)]
        child_s = [child_ref[a] for a in range(A)]
    else:
        prior_s, wsum_s, visits_s, child_s = (
            prior_ref, wsum_ref, visits_ref, child_ref)
    vio = jax.lax.broadcasted_iota(jnp.int32, (V, Gb), 0)
    nodes_out[:] = jnp.full((max_depth, Gb), -1, jnp.int32)
    actions_out[:] = jnp.zeros((max_depth, Gb), jnp.int32)

    def cond(st):
        d, node, found, leaf_action, needs_alloc = st
        return jnp.logical_and(d < max_depth, jnp.min(found) < 0.5)

    def body(st):
        d, node, found, leaf_action, needs_alloc = st
        oh = (vio == node).astype(jnp.float32)  # [V, Gb]
        exp = jnp.sum(expanded.astype(jnp.float32) * oh, axis=0,
                      keepdims=True)  # [1, Gb] in {0,1}
        live = (1.0 - found) * exp
        # gather the stat rows at each game's node, solve for its policy
        p_a = [jnp.sum(prior_s[a] * oh, axis=0, keepdims=True)
               for a in range(A)]
        w_a = [jnp.sum(wsum_s[a] * oh, axis=0, keepdims=True)
               for a in range(A)]
        v_a = [jnp.sum(visits_s[a] * oh, axis=0, keepdims=True)
               for a in range(A)]
        pi_a = _node_policy_rows(p_a, w_a, v_a, cpuct=cpuct,
                                 num_actions=A)

        @pl.when(d == 0)
        def _():
            for a in range(A):
                rootpi_out[pl.ds(a, 1), :] = pi_a[a]

        # CDF sample (newton.cdf_sample semantics)
        prob = probs_ref[pl.ds(d, 1), :]
        csum = jnp.zeros_like(prob)
        reach_a = []
        for a in range(A):
            csum = csum + pi_a[a]
            reach_a.append((csum >= prob) & (pi_a[a] > 0))
        first = jnp.zeros_like(prob, dtype=jnp.int32)
        for a in range(A - 1, -1, -1):
            first = jnp.where(reach_a[a], a, first)
        any_reach = jnp.zeros_like(prob)
        for a in range(A):
            any_reach = jnp.maximum(any_reach, reach_a[a].astype(jnp.float32))
        last_pos = jnp.zeros_like(prob, dtype=jnp.int32)
        for a in range(A):
            last_pos = jnp.where(pi_a[a] > 0, a, last_pos)
        action = jnp.where(any_reach > 0.5, first, last_pos)  # [1, Gb]

        nodes_out[pl.ds(d, 1), :] = jnp.where(live > 0.5, node, -1)
        actions_out[pl.ds(d, 1), :] = action

        cid = jnp.zeros_like(prob)
        for a in range(A):
            ca = jnp.sum(child_s[a].astype(jnp.float32) * oh, axis=0,
                         keepdims=True)
            cid = cid + ca * (action == a).astype(jnp.float32)
        cid = cid.astype(jnp.int32)
        hit_missing = live * (cid == 0).astype(jnp.float32)
        leaf_action = jnp.where(hit_missing > 0.5, action, leaf_action)
        needs_alloc = jnp.maximum(needs_alloc, hit_missing)
        found = jnp.maximum(found, jnp.maximum(1.0 - exp, hit_missing))
        step = (live * (cid > 0).astype(jnp.float32)) > 0.5
        node = jnp.where(step, cid, node)
        return d + 1, node, found, leaf_action, needs_alloc

    init = (
        jnp.int32(0),
        jnp.zeros((1, Gb), jnp.int32),
        jnp.zeros((1, Gb), jnp.float32),
        jnp.zeros((1, Gb), jnp.int32),
        jnp.zeros((1, Gb), jnp.float32),
    )
    _, node, _, leaf_action, needs_alloc = jax.lax.while_loop(
        cond, body, init)
    leaf_out[:] = node
    laction_out[:] = leaf_action
    alloc_out[:] = needs_alloc.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("cpuct",))
def select_pallas(prior, wsum, visits, child, expanded, probs, cpuct: float):
    """(path_nodes, path_actions, node, leaf_action, needs_alloc, root_pi):
    the per-rollout selection walk in one kernel.  probs: f32[D, G]."""
    A, V, G = prior.shape
    D = probs.shape[0]
    Gb = games_block(A)
    assert G % Gb == 0
    grid = (G // Gb,)

    def avg(i):
        return (0, 0, i)

    def vg(i):
        return (0, i)

    stat_spec = pl.BlockSpec((A, V, Gb), avg, memory_space=pltpu.VMEM)
    vg_spec = pl.BlockSpec((V, Gb), vg, memory_space=pltpu.VMEM)
    dg_spec = pl.BlockSpec((D, Gb), vg, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, Gb), vg, memory_space=pltpu.VMEM)
    ag_spec = pl.BlockSpec((A, Gb), vg, memory_space=pltpu.VMEM)

    nodes, actions, node, laction, alloc, rootpi = pl.pallas_call(
        functools.partial(_select_kernel, cpuct=cpuct, num_actions=A,
                          max_depth=D),
        out_shape=(
            jax.ShapeDtypeStruct((D, G), jnp.int32),
            jax.ShapeDtypeStruct((D, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int8),
            jax.ShapeDtypeStruct((A, G), jnp.float32),
        ),
        grid=grid,
        in_specs=[stat_spec, stat_spec, stat_spec, stat_spec, vg_spec,
                  dg_spec],
        out_specs=(dg_spec, dg_spec, row_spec, row_spec, row_spec, ag_spec),
        compiler_params=_compiler_params(A),
    )(prior, wsum, visits, child, expanded.astype(jnp.int8), probs)
    return nodes, actions, node[0], laction[0], alloc[0] != 0, rootpi


# ---------------------------------------------------------------------------
# backup
# ---------------------------------------------------------------------------


def _backup_kernel(nodes_ref, actions_ref, length_ref, value_ref,
                   wsum_in, visits_in, wsum_out, visits_out, *, num_actions):
    """Apply every recorded path edge's (value-sum, visits) multiply-add
    with the stat blocks VMEM-resident: the jnp while_loop version streams
    the full [A, V, G] arrays from HBM once per *depth step* - here the
    whole walk costs one HBM read + one write per block regardless of path
    length."""
    A = num_actions
    V = wsum_in.shape[1]
    length = length_ref[:]  # [1, Gb] i32
    value = value_ref[:]  # [1, Gb] f32
    vio = jax.lax.broadcasted_iota(jnp.int32, (V, length.shape[1]), 0)

    max_len = jnp.max(length)

    def edge_update(d, get_w, get_v):
        nodes = nodes_ref[pl.ds(d, 1), :]  # [1, Gb]
        actions = actions_ref[pl.ds(d, 1), :]
        valid = nodes >= 0
        k = length - 1 - d
        contrib = jnp.where(k % 2 == 0, 1.0 - value, value)  # [1, Gb]
        oh = (vio == nodes) & valid  # [V, Gb]
        out_w, out_v = [], []
        for a in range(A):
            hit = (oh & (actions == a)).astype(jnp.float32)
            out_w.append(get_w(a) + hit * contrib)
            out_v.append(get_v(a) + hit)
        return out_w, out_v

    if _narrow(A):
        # carry the whole stat block through the loop in registers/stack
        def cond(st):
            return st[0] < max_len

        def body(st):
            d, w_a, vis_a = st
            w_a, vis_a = edge_update(d, lambda a: w_a[a], lambda a: vis_a[a])
            return d + 1, w_a, vis_a

        _, w_a, vis_a = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), [wsum_in[a] for a in range(A)],
             [visits_in[a] for a in range(A)]),
        )
        for a in range(A):
            wsum_out[a] = w_a[a]
            visits_out[a] = vis_a[a]
    else:
        # wide boards: update the output refs in place (carrying A x [V, Gb]
        # values would blow the scoped-vmem budget at A up to 169)
        for a in range(A):
            wsum_out[a] = wsum_in[a]
            visits_out[a] = visits_in[a]

        def cond2(d):
            return d < max_len

        def body2(d):
            w_a, vis_a = edge_update(
                d, lambda a: wsum_out[a], lambda a: visits_out[a])
            for a in range(A):
                wsum_out[a] = w_a[a]
                visits_out[a] = vis_a[a]
            return d + 1

        jax.lax.while_loop(cond2, body2, jnp.int32(0))


@jax.jit
def backup_pallas(wsum, visits, path_nodes, path_actions, path_length,
                  leaf_value):
    """(wsum', visits'): all path-edge updates in one VMEM pass.

    wsum/visits [A, V, G] f32; path_nodes/actions [D, G] i32 (node -1 =
    nothing recorded); path_length [G] i32; leaf_value [G] f32.
    """
    A, V, G = wsum.shape
    D = path_nodes.shape[0]
    Gb = games_block(A)
    grid = (G // Gb,)

    def avg(i):
        return (0, 0, i)

    def vg(i):
        return (0, i)

    stat_spec = pl.BlockSpec((A, V, Gb), avg, memory_space=pltpu.VMEM)
    dg_spec = pl.BlockSpec((D, Gb), vg, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, Gb), vg, memory_space=pltpu.VMEM)

    w2, v2 = pl.pallas_call(
        functools.partial(_backup_kernel, num_actions=A),
        out_shape=(
            jax.ShapeDtypeStruct((A, V, G), jnp.float32),
            jax.ShapeDtypeStruct((A, V, G), jnp.float32),
        ),
        grid=grid,
        in_specs=[dg_spec, dg_spec, row_spec, row_spec,
                  stat_spec, stat_spec],
        out_specs=(stat_spec, stat_spec),
        input_output_aliases={4: 0, 5: 1},
        compiler_params=_compiler_params(A),
    )(
        path_nodes, path_actions, path_length[None, :],
        leaf_value[None, :], wsum, visits,
    )
    return w2, v2
