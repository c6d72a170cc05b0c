"""Pallas TPU kernels for the MCTS hot paths.

The regularized-policy Newton solve is the reference's stated bottleneck
(README.md:81).  The pure-jnp refresh (newton.py) streams the [A, V, G]
stat arrays from HBM on *every* unrolled Newton step (~0.5 GB per chunk at
G=16k); this kernel blocks the games axis, keeps each [A, V, Gb] slice
VMEM-resident, and runs the entire solve on-chip - HBM traffic drops to
one read of (prior, q, visits, policy, stale) plus one policy write per
rollout, independent of iteration count.

Numerics are identical to :func:`alphatpu.mcts.newton.regularized_policy`:
same alpha init with the 1e-4 gap floor (mcts_gpu.jl:136), same latched
convergence rule (err < 1e-3 or repeated err), same iteration cap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .newton import ALPHA_FLOOR, NEWTON_CHUNK, NEWTON_MAX_CHUNKS, NEWTON_TOL

# f32 lane tile is (8, 128): G blocks must be multiples of 128.  256 keeps
# 6 double-buffered [A, V, Gb] blocks + per-action temporaries under the
# 16 MB VMEM budget at V = 64.
GAMES_BLOCK = 256


def _refresh_kernel(prior_ref, q_ref, visits_ref, policy_ref, stale_ref,
                    out_ref, *, cpuct, num_actions):
    """All math is on 2D [V, Gb] tiles with a static unroll over the small
    leading action axis (stats are action-major [A, V, G], so every a-slice
    is a contiguous (sublane, lane)-aligned tile - middle-dim broadcasts of
    a 3D block are an unsupported Mosaic shape cast, and slicing a minor
    axis would stride across sublanes)."""
    A = num_actions
    stale = stale_ref[:] != 0  # [V, Gb]
    prior_a = [prior_ref[a] for a in range(A)]
    q_a = [q_ref[a] for a in range(A)]

    n = 1.0 + sum(visits_ref[a] for a in range(A))  # [V, Gb]
    acts = sum((p > 0).astype(jnp.float32) for p in prior_a)
    lam = cpuct * jnp.sqrt(n) / (acts + n)
    top_a = [lam * p for p in prior_a]
    alpha = q_a[0] + jnp.maximum(top_a[0], ALPHA_FLOOR)
    for a in range(1, A):
        alpha = jnp.maximum(alpha, q_a[a] + jnp.maximum(top_a[a], ALPHA_FLOOR))

    def step(st):
        # conv is a {0,1} f32 mask: Mosaic can't carry i1 vectors through
        # loop regions.
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

    def cond(st):
        (_, _, conv), j = st
        return jnp.logical_and(j < NEWTON_MAX_CHUNKS, jnp.min(conv) < 0.5)

    def body(st):
        inner, j = st
        for _ in range(NEWTON_CHUNK):  # static unroll, all in VMEM
            inner = step(inner)
        return inner, j + 1

    init = (
        alpha,
        jnp.full_like(alpha, jnp.inf),
        # non-stale lanes' results are discarded by the final select -
        # start them converged so they never cost an extra chunk
        1.0 - stale.astype(jnp.float32),
    )
    (alpha, _, _), _ = jax.lax.while_loop(cond, body, (init, jnp.int32(0)))
    for a in range(A):
        pi = top_a[a] / (alpha - q_a[a])
        out_ref[a] = jnp.where(stale, pi, policy_ref[a])


@functools.partial(jax.jit, static_argnames=("cpuct",))
def refresh_policies_pallas(prior, q, visits, policy, stale, cpuct: float):
    """policy' [A, V, G]: regularized policy where ``stale``, else the
    stored policy.  Layouts are the tree's native [A, V, G] / [V, G] - no
    transposes.  Requires G % GAMES_BLOCK == 0 and V % 8 == 0."""
    A, V, G = prior.shape
    assert G % GAMES_BLOCK == 0
    grid = (G // GAMES_BLOCK,)

    def avg(i):
        return (0, 0, i)

    def vg(i):
        return (0, i)

    stat_spec = pl.BlockSpec((A, V, GAMES_BLOCK), avg,
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_refresh_kernel, cpuct=cpuct, num_actions=A),
        out_shape=jax.ShapeDtypeStruct((A, V, G), jnp.float32),
        grid=grid,
        in_specs=[
            stat_spec,  # prior
            stat_spec,  # q
            stat_spec,  # visits
            stat_spec,  # policy
            pl.BlockSpec((V, GAMES_BLOCK), vg, memory_space=pltpu.VMEM),
        ],
        out_specs=stat_spec,
    )(prior, q, visits, policy, stale.astype(jnp.int8))


def refresh_supported(num_games: int, num_nodes: int = 8) -> bool:
    """The kernel path needs a TPU backend (the axon tunnel platform is a
    TPU) and tile-aligned dims: G on the 128 lanes, V on the 8 sublanes."""
    backend = jax.default_backend()
    return (
        backend in ("tpu", "axon")
        and num_games % GAMES_BLOCK == 0
        and num_nodes % 8 == 0
    )


# ---------------------------------------------------------------------------
# backup
# ---------------------------------------------------------------------------


def _backup_kernel(nodes_ref, actions_ref, length_ref, value_ref,
                   q_in, visits_in, uptodate_in,
                   q_out, visits_out, uptodate_out, *, num_actions):
    """Apply every recorded path edge's (q, visits) update with the stat
    blocks VMEM-resident: the jnp while_loop version streams the full
    [A, V, G] arrays from HBM once per *depth step* (backUp,
    mcts_gpu.jl:306-328 walks parent pointers; search.backup walks the
    recorded path) - here the whole walk costs one HBM read + one write
    per block regardless of path length."""
    A = num_actions
    V = q_in.shape[1]
    length = length_ref[:]  # [1, Gb] i32
    value = value_ref[:]  # [1, Gb] f32
    vio = jax.lax.broadcasted_iota(jnp.int32, (V, length.shape[1]), 0)

    q_a = [q_in[a] for a in range(A)]
    vis_a = [visits_in[a] for a in range(A)]
    uptodate = uptodate_in[:]  # [V, Gb] i8

    max_len = jnp.max(length)

    def cond(st):
        d = st[0]
        return d < max_len

    def body(st):
        d, q_a, vis_a, uptodate = st
        nodes = nodes_ref[pl.ds(d, 1), :]  # [1, Gb]
        actions = actions_ref[pl.ds(d, 1), :]
        valid = nodes >= 0
        k = length - 1 - d
        contrib = jnp.where(k % 2 == 0, 1.0 - value, value)  # [1, Gb]
        oh = (vio == nodes) & valid  # [V, Gb]
        new_q = []
        new_vis = []
        for a in range(A):
            hit = oh & (actions == a)
            nq = (vis_a[a] * q_a[a] + contrib) / (vis_a[a] + 1.0)
            new_q.append(jnp.where(hit, nq, q_a[a]))
            new_vis.append(jnp.where(hit, vis_a[a] + 1.0, vis_a[a]))
        uptodate = jnp.where(oh, jnp.int8(0), uptodate)
        return d + 1, new_q, new_vis, uptodate

    _, q_a, vis_a, uptodate = jax.lax.while_loop(
        cond, body, (jnp.int32(0), q_a, vis_a, uptodate)
    )
    for a in range(A):
        q_out[a] = q_a[a]
        visits_out[a] = vis_a[a]
    uptodate_out[:] = uptodate


@functools.partial(jax.jit, static_argnames=())
def backup_pallas(q, visits, uptodate, path_nodes, path_actions, path_length,
                  leaf_value):
    """(q', visits', uptodate'): all path-edge updates in one VMEM pass.

    q/visits [A, V, G] f32; uptodate [V, G] bool; path_nodes/actions [D, G]
    i32 (node -1 = nothing recorded); path_length [G] i32; leaf_value [G] f32.
    """
    A, V, G = q.shape
    D = path_nodes.shape[0]
    grid = (G // GAMES_BLOCK,)

    def avg(i):
        return (0, 0, i)

    def vg(i):
        return (0, i)

    def dg(i):
        return (0, i)

    def g1(i):
        return (0, i)

    stat_spec = pl.BlockSpec((A, V, GAMES_BLOCK), avg, memory_space=pltpu.VMEM)
    vg_spec = pl.BlockSpec((V, GAMES_BLOCK), vg, memory_space=pltpu.VMEM)
    dg_spec = pl.BlockSpec((D, GAMES_BLOCK), dg, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, GAMES_BLOCK), g1, memory_space=pltpu.VMEM)

    q2, v2, u2 = pl.pallas_call(
        functools.partial(_backup_kernel, num_actions=A),
        out_shape=(
            jax.ShapeDtypeStruct((A, V, G), jnp.float32),
            jax.ShapeDtypeStruct((A, V, G), jnp.float32),
            jax.ShapeDtypeStruct((V, G), jnp.int8),
        ),
        grid=grid,
        in_specs=[dg_spec, dg_spec, row_spec, row_spec,
                  stat_spec, stat_spec, vg_spec],
        out_specs=(stat_spec, stat_spec, vg_spec),
        input_output_aliases={4: 0, 5: 1, 6: 2},
    )(
        path_nodes, path_actions, path_length[None, :],
        leaf_value[None, :], q, visits, uptodate.astype(jnp.int8),
    )
    return q2, v2, u2 != 0
