"""Pallas TPU kernels for the MCTS hot paths.

Two kernels cover the whole per-rollout tree work:

* **select** fuses the regularized-policy Newton solve - the reference's
  stated bottleneck (README.md:81; kdescendTree!, mcts_gpu.jl:114-169) -
  with the root-to-leaf walk.  The policy is computed *on the fly* per
  depth step from the gathered (prior, value-sum, visits) rows of the
  current node, so no policy cache exists at all (see search.py for the
  exact-equivalence argument).  The jnp pipeline streams the [A, V, G]
  stats from HBM once per depth step; here the whole walk costs one HBM
  read of the stats per rollout.
* **backup** applies every recorded path edge's (value-sum, visits)
  multiply-add with the stat blocks VMEM-resident (backUp,
  mcts_gpu.jl:306-328) - one HBM read + write per rollout regardless of
  path length.

The Newton solve and the CDF sampling walk are vectorized over the action
axis ([A, Gb] tiles; prefix sums via sublane rolls), so the math's
op-issue count is independent of board width (A up to 169 for 13x13
Gobang/Hex).  The node-axis (V) gathers in select are straight-line
action-outer one-hot reduces (static slices only - measured faster than
dynamic live-span chunking, whose per-chunk scratch read-modify-write and
loop overheads dominated); backup's edge updates are bounded to the
8-sublane chunks its path nodes actually land in (ids are
allocation-ordered, so depth 0 is always the root chunk).

Numerics vs the jnp reference in :mod:`alphatpu.mcts.search` /
:mod:`alphatpu.mcts.newton`: the Newton solve is bit-identical (same alpha
init with the 1e-4 gap floor, mcts_gpu.jl:136; same latched convergence
rule - err < 1e-3 or repeated err; same iteration cap).  The CDF sampling
walk follows the same rule (inclusive prefix reach + last-positive
fallback) but builds the prefix sum with a Hillis-Steele roll scan whose
float accumulation order differs from ``jnp.cumsum`` - so kernel and
fallback can *rarely* pick different actions when the drawn uniform lands
exactly on a prefix-sum boundary (bit-approximate, not bit-exact;
benchmarks/kernel_parity.py tolerates the occasional action divergence).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .newton import ALPHA_FLOOR, NEWTON_CHUNK, NEWTON_MAX_CHUNKS, NEWTON_TOL

# f32 lane tile is (8, 128): G blocks must be multiples of 128.  256 lanes
# for small action spaces; 128 for wide boards (Gobang/Hex/Reversi8) whose
# [A, V, Gb] stat blocks are A-times larger.
_VMEM_LIMIT = 100 * 1024 * 1024  # Mosaic default is 16 MB; v5e has 128 MB


def games_block(num_actions: int, num_nodes: int | None = None,
                num_games: int | None = None) -> int:
    """Lane-block width: 256 when the [A, V, 256] stat blocks fit the VMEM
    budget (fewer grid steps, better overhead amortization), else 128.
    Callers that know G pass it so the choice stays divisible."""
    force = os.environ.get("ALPHATPU_GB")  # measurement override (A/B)
    gb = int(force) if force else 256
    if not force and num_actions > 16 and not (
        num_nodes is not None
        and 12 * num_actions * num_nodes * 256 * 4 < _VMEM_LIMIT
    ):
        gb = 128
    if num_games is not None and num_games % gb != 0:
        gb = 128
    return gb


def _narrow(num_actions: int) -> bool:
    """Narrow action spaces keep gathered per-action rows live in vector
    registers (concatenated to one [A, Gb] tile); wide boards stream rows
    into VMEM scratch instead - A x [V, Gb] of live registers would blow
    the scoped-vmem budget."""
    return num_actions <= 16


def _compiler_params(num_actions: int, num_nodes: int,
                     num_games: int | None = None):
    # Only big stat blocks need a raised scoped-vmem ceiling; the default
    # 16 MB budget compiles measurably better schedules when it fits.  The
    # kernels keep ~3 block-sized values live (carries + the 3D edge mask)
    # plus in/out buffers, so gate well below the 16 MB default.
    gb = games_block(num_actions, num_nodes, num_games)
    block_bytes = num_actions * num_nodes * gb * 4
    if 12 * block_bytes < 8 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def select_supported(num_games: int, num_nodes: int, num_actions: int) -> bool:
    """The kernel path needs a TPU backend (the axon tunnel platform is a
    TPU), tile-aligned dims (G on the 128 lanes, V on the 8 sublanes) and
    stat blocks that fit VMEM.

    The VMEM gate must *provably* cover the kernels' live blocks, because a
    near-limit shape fails Mosaic compilation outright instead of falling
    back.  Worst case is backup: 2 double-buffered stat inputs + 2 aliased
    outputs (4 blocks) plus the 2 full-block while_loop carries = 6 blocks;
    select holds 4 double-buffered stat inputs = 8 blocks plus [A, Gb]-sized
    scratch/rows.  12 blocks of headroom covers both with a 2-block margin
    for Mosaic temporaries."""
    if os.environ.get("ALPHATPU_NO_KERNELS"):  # debug: force the jnp path
        return False
    backend = jax.default_backend()
    gb = games_block(num_actions, num_nodes, num_games)
    block_bytes = num_actions * num_nodes * gb * 4
    return (
        backend in ("tpu", "axon")
        and num_games % gb == 0
        and num_nodes % 8 == 0
        # A > 128 (gobang13/hex13) crashed the TPU worker in Mosaic-compiled
        # select (results_r3 hex13 entry); those boards take the jnp path
        # until the kernel is validated there.
        and num_actions <= 128
        and 12 * block_bytes < _VMEM_LIMIT
    )


# ---------------------------------------------------------------------------
# select (fused on-the-fly regularized policy + descend)
# ---------------------------------------------------------------------------


def _node_policy_2d(P, Q, Vv, *, cpuct):
    """Regularized policy for gathered node rows: P/Q/Vv are [A, Gb] (one
    row per lane).  Matches newton.regularized_policy + the fresh-node
    prior shortcut (search.node_policy): same alpha init, same latched
    convergence, same iteration cap."""
    nvis = jnp.sum(Vv, axis=0, keepdims=True)  # [1, Gb]
    n = 1.0 + nvis
    acts = jnp.sum((P > 0).astype(jnp.float32), axis=0, keepdims=True)
    lam = cpuct * jnp.sqrt(n) / (acts + n)  # [1, Gb]
    TOP = lam * P  # [A, Gb]
    alpha = jnp.max(Q + jnp.maximum(TOP, ALPHA_FLOOR), axis=0, keepdims=True)

    def nstep(st):
        alpha, prev_err, conv = st
        r = 1.0 / (alpha - Q)  # [A, Gb]; divide-once form of newton.step
        frac = TOP * r
        s = jnp.sum(frac, axis=0, keepdims=True)
        grad = -jnp.sum(frac * r, axis=0, keepdims=True)
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
    PI = TOP / (alpha - Q)
    return jnp.where(fresh > 0.5, P, PI)


def _cdf_sample_2d(PI, prob, aio, num_actions):
    """newton.cdf_sample on [A, Gb] rows: first action whose inclusive
    prefix sum reaches ``prob`` (and has positive mass), else the last
    positive action, else 0.  Prefix sums are a Hillis-Steele scan over
    sublane rolls."""
    A = num_actions
    c = PI
    k = 1
    while k < A:
        c = c + jnp.where(aio >= k, pltpu.roll(c, k, 0), 0.0)
        k *= 2
    reach = (c >= prob) & (PI > 0)
    first = jnp.min(jnp.where(reach, aio, A), axis=0, keepdims=True)
    last_pos = jnp.max(jnp.where(PI > 0, aio, -1), axis=0, keepdims=True)
    last_pos = jnp.maximum(last_pos, 0)
    return jnp.where(first < A, first, last_pos)  # [1, Gb] i32


def _select_kernel(prior_ref, wsum_ref, visits_ref, child_ref, expanded_ref,
                   probs_ref,
                   nodes_out, actions_out, leaf_out, laction_out, alloc_out,
                   rootpi_out, p_scr, w_scr, v_scr, c_scr,
                   *, cpuct, num_actions, max_depth):
    A = num_actions
    V = prior_ref.shape[1]
    Gb = prior_ref.shape[2]
    aio = jax.lax.broadcasted_iota(jnp.int32, (A, Gb), 0)
    nodes_out[:] = jnp.full((max_depth, Gb), -1, jnp.int32)
    actions_out[:] = jnp.zeros((max_depth, Gb), jnp.int32)

    def cond(st):
        d, node, found, leaf_action, needs_alloc = st
        return jnp.logical_and(d < max_depth, jnp.min(found) < 0.5)

    if _narrow(A):
        # keep per-action slices live in registers (fast at tiny A)
        vio = jax.lax.broadcasted_iota(jnp.int32, (V, Gb), 0)
        expanded = expanded_ref[:]  # [V, Gb] f32 {0,1}
        prior_s = [prior_ref[a] for a in range(A)]
        wsum_s = [wsum_ref[a] for a in range(A)]
        visits_s = [visits_ref[a] for a in range(A)]
        child_s = [child_ref[a] for a in range(A)]

        def gather_rows(node, found):
            """Stat rows of each lane's node: [1, Gb] expanded plus
            ([A, Gb] prior, value-sum, visits, child)."""
            oh = (vio == node).astype(jnp.float32)  # [V, Gb]
            exp = jnp.sum(expanded * oh, axis=0, keepdims=True)
            P = jnp.concatenate(
                [jnp.sum(prior_s[a] * oh, axis=0, keepdims=True)
                 for a in range(A)], axis=0)
            W = jnp.concatenate(
                [jnp.sum(wsum_s[a] * oh, axis=0, keepdims=True)
                 for a in range(A)], axis=0)
            Vv = jnp.concatenate(
                [jnp.sum(visits_s[a] * oh, axis=0, keepdims=True)
                 for a in range(A)], axis=0)
            CR = jnp.concatenate(
                [jnp.sum(child_s[a].astype(jnp.float32) * oh, axis=0,
                         keepdims=True) for a in range(A)], axis=0)
            return exp, P, W, Vv, CR
    else:
        vio = jax.lax.broadcasted_iota(jnp.int32, (V, Gb), 0)

        def gather_rows(node, found):
            """Wide boards: action-outer static unroll.  One full [V, Gb]
            node one-hot per depth step, then per action a STATIC slice
            ``ref[a]`` multiplied and sublane-reduced into the scratch row
            ``scr[a]`` - pure straight-line vector code with no dynamic
            slices, no fori_loop, no span bookkeeping and no
            read-modify-write accumulation (each scratch row is written
            exactly once).  Measured faster than both the earlier live-span
            chunked gather and the full-block broadcast-reduce and chunk-of-8
            A/B variants (commit 1323f41: 2.94 -> 1.99 ms/rollout on hex7),
            which were pruned after losing.  Finished lanes read node 0's
            row, which the policy/sampling math never consumes."""
            oh = (vio == node).astype(jnp.float32)  # [V, Gb]
            exp = jnp.sum(expanded_ref[:] * oh, axis=0, keepdims=True)
            for a in range(A):
                p_scr[pl.ds(a, 1)] = jnp.sum(
                    prior_ref[a] * oh, axis=0, keepdims=True)
                w_scr[pl.ds(a, 1)] = jnp.sum(
                    wsum_ref[a] * oh, axis=0, keepdims=True)
                v_scr[pl.ds(a, 1)] = jnp.sum(
                    visits_ref[a] * oh, axis=0, keepdims=True)
                c_scr[pl.ds(a, 1)] = jnp.sum(
                    child_ref[a].astype(jnp.float32) * oh, axis=0,
                    keepdims=True)
            return exp, p_scr[:], w_scr[:], v_scr[:], c_scr[:]

    def body(st):
        d, node, found, leaf_action, needs_alloc = st
        exp, P, W, Vv, CR = gather_rows(node, found)
        live = (1.0 - found) * exp
        Q = jnp.where(Vv > 0, W / jnp.maximum(Vv, 1.0), 0.0)

        PI = _node_policy_2d(P, Q, Vv, cpuct=cpuct)

        @pl.when(d == 0)
        def _():
            rootpi_out[:] = PI

        prob = probs_ref[pl.ds(d, 1), :]
        action = _cdf_sample_2d(PI, prob, aio, A)

        nodes_out[pl.ds(d, 1), :] = jnp.where(live > 0.5, node, -1)
        actions_out[pl.ds(d, 1), :] = jnp.where(live > 0.5, action, 0)

        cid = jnp.sum(
            jnp.where(aio == action, CR, 0.0), axis=0, keepdims=True
        ).astype(jnp.int32)
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


@functools.partial(jax.jit, static_argnames=("cpuct", "interpret", "vseg"))
def select_pallas(prior, wsum, visits, child, expanded, probs, cpuct: float,
                  interpret: bool = False, vseg: int | None = None):
    """(path_nodes, path_actions, node, leaf_action, needs_alloc, root_pi):
    the per-rollout selection walk in one kernel.  probs: f32[D, G].

    ``vseg`` (a multiple of 8 <= V) bounds the node rows the kernel streams
    from HBM to the first ``vseg``: node ids are allocation-ordered (<= 1
    alloc per rollout), so rollout r only ever reads rows <= r - the
    segmented rollout loop in search.run_mcts exploits this to cut the
    dominant HBM stream of early rollouts (the tree "grows" through
    kernel-visible segments while living in one fixed allocation).

    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend) - the CI parity path (tests/test_pallas.py)."""
    A, V, G = prior.shape
    D = probs.shape[0]
    Vb = vseg or V
    assert Vb % 8 == 0 and Vb <= V
    Gb = games_block(A, V, G)
    assert G % Gb == 0
    grid = (G // Gb,)

    def avg(i):
        return (0, 0, i)

    def vg(i):
        return (0, i)

    stat_spec = pl.BlockSpec((A, Vb, Gb), avg, memory_space=pltpu.VMEM)
    vg_spec = pl.BlockSpec((Vb, Gb), vg, memory_space=pltpu.VMEM)
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
        scratch_shapes=[pltpu.VMEM((A, Gb), jnp.float32)] * 4,
        compiler_params=_compiler_params(A, V, G),
        interpret=interpret,
        # expanded travels as f32: the wide path dynamic-slices it in
        # 8-sublane chunks, and i8 tiles are 32-sublane.
    )(prior, wsum, visits, child, expanded.astype(jnp.float32), probs)
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
    length.  After a copy-through of the blocks, each depth step updates
    only the 8-sublane node chunks its edges actually land in (ids are
    allocation-ordered: depth 0 is always the root chunk, deeper edges
    span at most the current allocation count) - a read-modify-write of
    [A, 8, Gb] slices instead of a full [A, V, Gb] pass per depth."""
    A = num_actions
    V = wsum_in.shape[1]
    length = length_ref[:]  # [1, Gb] i32
    value = value_ref[:]  # [1, Gb] f32
    Gb = length.shape[1]
    aio = jax.lax.broadcasted_iota(jnp.int32, (A, Gb), 0)
    sio = jax.lax.broadcasted_iota(jnp.int32, (8, Gb), 0)

    wsum_out[:] = wsum_in[:]
    visits_out[:] = visits_in[:]
    max_len = jnp.max(length)

    def body(d, _):
        nodes = nodes_ref[pl.ds(d, 1), :]  # [1, Gb]; -1 = nothing recorded
        actions = actions_ref[pl.ds(d, 1), :]
        valid = nodes >= 0
        k = length - 1 - d
        contrib = jnp.where(k % 2 == 0, 1.0 - value, value)  # [1, Gb]
        am = (aio == actions).astype(jnp.float32)  # [A, Gb]
        amc = am * contrib
        lo = jnp.min(jnp.where(valid, nodes, V - 1))
        hi = jnp.max(jnp.where(valid, nodes, 0))
        lo8 = (lo // 8) * 8
        nch = hi // 8 - lo // 8 + 1  # <= 0 if no lane is valid at depth d

        def chunk(j, c):
            base = pl.multiple_of(lo8 + j * 8, 8)
            # invalid lanes (node -1) never match a chunk row
            vm = ((sio + base) == nodes).astype(jnp.float32)  # [8, Gb]
            wsum_out[:, pl.ds(base, 8), :] += amc[:, None, :] * vm[None]
            visits_out[:, pl.ds(base, 8), :] += am[:, None, :] * vm[None]
            return c

        jax.lax.fori_loop(0, nch, chunk, 0)
        return _

    jax.lax.fori_loop(0, max_len, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "vseg"))
def backup_pallas(wsum, visits, path_nodes, path_actions, path_length,
                  leaf_value, interpret: bool = False,
                  vseg: int | None = None):
    """(wsum', visits'): all path-edge updates in one VMEM pass.

    wsum/visits [A, V, G] f32; path_nodes/actions [D, G] i32 (node -1 =
    nothing recorded); path_length [G] i32; leaf_value [G] f32.

    ``vseg`` bounds the streamed node rows like in :func:`select_pallas`;
    rows >= vseg pass through untouched via the input/output aliasing (the
    kernel never visits those blocks, so the aliased buffer keeps them).
    """
    A, V, G = wsum.shape
    D = path_nodes.shape[0]
    Vb = vseg or V
    assert Vb % 8 == 0 and Vb <= V
    Gb = games_block(A, V, G)
    grid = (G // Gb,)

    def avg(i):
        return (0, 0, i)

    def vg(i):
        return (0, i)

    stat_spec = pl.BlockSpec((A, Vb, Gb), avg, memory_space=pltpu.VMEM)
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
        compiler_params=_compiler_params(A, V, G),
        interpret=interpret,
    )(
        path_nodes, path_actions, path_length[None, :],
        leaf_value[None, :], wsum, visits,
    )
    return w2, v2
