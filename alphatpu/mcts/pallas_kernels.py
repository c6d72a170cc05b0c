"""Pallas TPU kernels for the MCTS hot paths.

The production rollout loop runs ONE fused kernel per rollout
(**select_apply**): it applies the previous rollout's deferred stat writes
- the backup's per-edge (value-sum, visits) adds and the expanded leaf's
prior row - to the VMEM-resident stat blocks, writes the blocks back out
through input/output aliasing, and then runs this rollout's root-to-leaf
selection walk on the updated blocks.  Per rollout the [A, V, G] stats
cross HBM exactly once in and once out; there is no stored child table at
all (child ids are derived from the per-node parent/action_from scalars),
no policy cache, and no separate backup pass.  Standalone pieces remain
for the flush and for tests/benchmarks:

* **select** - the walk alone (read-only), fusing the regularized-policy
  Newton solve - the reference's stated bottleneck (README.md:81;
  kdescendTree!, mcts_gpu.jl:114-169) - with the descent.  The policy is
  computed *on the fly* per depth step from the gathered (prior,
  value-sum, visits) rows of the current node (see search.py for the
  exact-equivalence argument).
* **backup** - the per-edge adds alone (backUp, mcts_gpu.jl:306-328),
  used to flush the last rollout's pending update after the scan.

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .newton import ALPHA_FLOOR, NEWTON_CHUNK, NEWTON_MAX_CHUNKS, NEWTON_TOL

# f32 lane tile is (8, 128): G blocks must be multiples of 128.  256 lanes
# for small action spaces; 128 for wide boards (Gobang/Hex/Reversi8) whose
# [A, V, Gb] stat blocks are A-times larger.
_VMEM_LIMIT = 100 * 1024 * 1024  # Mosaic default is 16 MB; v5e has 128 MB


def games_block(num_actions: int, num_nodes: int | None = None,
                num_games: int | None = None, itemsize: int = 4,
                budget_blocks: int = 12) -> int:
    """Lane-block width: the widest of 1024/512/256/128 whose [A, V, Gb]
    stat blocks fit the VMEM budget and divide G.  Fewer, fatter grid
    blocks amortize per-block overheads (pipeline prologue, scratch init,
    the walk's max-depth tie across the block): measured on connect4
    g8192, Gb 256 -> 1024 is 32.5 -> 25.5 ms/move (-21%).  Narrow boards
    (register gather path) cap at 1024; wide boards at 512 - their
    blocks are A-times larger and the scratch rows scale with Gb.
    ``itemsize`` is the stat storage width (4 = f32/packed, 2 = bf16).

    ``budget_blocks`` is the provable live-block headroom of the kernel
    family the blocks feed (select_supported's accounting): 12 for the
    2/3-plane kernels, PACKED1_BLOCKS for the single-plane kernel whose
    whole stat state is one plane (1 double-buffered input + 1
    double-buffered aliased output + temporaries) - wide boards fit
    wider lane blocks there."""
    force = os.environ.get("ALPHATPU_GB")  # measurement override (A/B)
    if force:
        gb = int(force)
        return gb if num_games is None or num_games % gb == 0 else 128

    def ok(gb):
        fits = (budget_blocks * num_actions * num_nodes * gb * itemsize
                < _VMEM_LIMIT
                if num_nodes is not None else gb <= 256)
        return fits and (num_games is None or num_games % gb == 0)

    # wide boards cap at 512 under the 12-block budget (measured choice);
    # the leaner single-plane budget lets the VMEM check decide instead
    gb = 1024 if (num_actions <= 16 or budget_blocks < 12) else 512
    while gb > 128 and not ok(gb):
        gb //= 2
    return gb


# the single-plane kernel's live-VMEM accounting: 2x double-buffered
# packed block (in + aliased out) + scratch/temporary margin
PACKED1_BLOCKS = 6


def _narrow(num_actions: int) -> bool:
    """Narrow action spaces keep gathered per-action rows live in vector
    registers (concatenated to one [A, Gb] tile); wide boards stream rows
    into VMEM scratch instead - A x [V, Gb] of live registers would blow
    the scoped-vmem budget."""
    return num_actions <= 16


def _compiler_params(num_actions: int, num_nodes: int,
                     num_games: int | None = None, itemsize: int = 4):
    # Only big stat blocks need a raised scoped-vmem ceiling; the default
    # 16 MB budget compiles measurably better schedules when it fits.  The
    # kernels keep ~3 block-sized values live (carries + the 3D edge mask)
    # plus in/out buffers, so gate well below the 16 MB default.
    gb = games_block(num_actions, num_nodes, num_games, itemsize)
    block_bytes = num_actions * num_nodes * gb * itemsize
    if 12 * block_bytes < 8 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def select_supported(num_games: int, num_nodes: int, num_actions: int,
                     itemsize: int = 4, budget_blocks: int = 12) -> bool:
    """The kernel path needs a TPU backend (the axon tunnel platform is a
    TPU), tile-aligned dims (G on the 128 lanes, V on the stat dtype's
    sublane tile - 8 rows for f32, 16 for bf16) and stat blocks that fit
    VMEM.

    The VMEM gate must *provably* cover the kernels' live blocks, because a
    near-limit shape fails Mosaic compilation outright instead of falling
    back.  Worst case is backup: 2 double-buffered stat inputs + 2 aliased
    outputs (4 blocks) plus the 2 full-block while_loop carries = 6 blocks;
    select holds 4 double-buffered stat inputs = 8 blocks plus [A, Gb]-sized
    scratch/rows.  12 blocks of headroom covers both with a 2-block margin
    for Mosaic temporaries.  The single-plane kernel passes
    ``budget_blocks=PACKED1_BLOCKS`` (its whole stat state is one plane),
    which admits wider lane blocks / bigger shapes."""
    tile = 32 // itemsize  # sublane rows per stat tile
    if os.environ.get("ALPHATPU_NO_KERNELS"):  # debug: force the jnp path
        return False
    if os.environ.get("ALPHATPU_FORCE_INTERPRET"):
        # CI hook: run the kernel path through the Pallas interpreter on
        # any backend (tests/test_pallas.py full-pipeline parity)
        return num_games % games_block(
            num_actions, num_nodes, num_games, itemsize, budget_blocks
        ) == 0 and num_nodes % tile == 0
    backend = jax.default_backend()
    gb = games_block(num_actions, num_nodes, num_games, itemsize,
                     budget_blocks)
    block_bytes = num_actions * num_nodes * gb * itemsize
    return (
        backend in ("tpu", "axon")
        and num_games % gb == 0
        and num_nodes % tile == 0
        and budget_blocks * block_bytes < _VMEM_LIMIT
    )


# ---------------------------------------------------------------------------
# packed (wsum | visits) stat plane
# ---------------------------------------------------------------------------
# The select walk is VPU-bound on the one-hot stat gathers (3 planes x A x V
# multiply-reduces per depth step; capping the Newton solve changes nothing,
# benchmarks/select_micro.py).  Packing the two mutable stats into ONE int32
# plane removes a whole plane from every gather (3 -> 2, ~33% of the hot
# loop) and turns the backup read-modify-write into a single integer add.
# (Plain bf16 *storage* was measured slower because each gathered element
# needed a real bf16->f32 convert inside the inner loop; the integer plane
# unpacks per gathered [A, Gb] ROW, not per [V] element.)
#
# Representation: one int32 word per edge = [wsum u16 fixed-point | visits
# u16 integer].  wsum is stored as round(wsum * S) with S = value_scale(R)
# a power of two chosen so R * S < 2**16 never overflows the high half.
# The plane is int32 (not uint32) because Mosaic implements signed but not
# unsigned reductions, and the one-hot gather is a sum-reduce.
#
# Why fixed-point and not bf16 bit-halves: with BOTH halves as integers,
# the whole backup read-modify-write collapses to ONE integer add -
# ``packed += edge_mask * ((contrib * S) << 16 | 1)`` - two vector ops per
# chunk element, where a float-packed form needs an unpack/f32-add/repack
# chain (~11 ops) that was measured to eat the entire gather saving.
#
# Precision contract: the ONLY quantization in the scheme is the leaf
# value rounded to the 1/S grid (quantize_value) BEFORE it enters a
# backup.  Both per-edge contributions (v and 1 - v) then lie on the grid,
# every f32 sum of <= R grid values is exact (R * S < 2**16 <= 2**24 f32
# integers), and the fixed-point kernel adds the identical integers - so
# the jnp twin needs ONE change only (quantize the leaf value) and matches
# the kernel BIT-EXACTLY, with no per-add rounding anywhere.  For the
# production R = 64 the grid is 1/512 (~0.2% of the value range); terminal
# values {0, 1/2, 1} are exactly on-grid for every S.


def value_scale(rollouts: int) -> int:
    """Largest power-of-two S with rollouts * S < 2**16: the fixed-point
    scale of the packed wsum half (1/S = value quantization step)."""
    s = 1
    while rollouts * (s * 2) < (1 << 16):
        s *= 2
    return s


def quantize_value(v, scale: int):
    """Round a leaf value in [0, 1] to the 1/scale grid (the one lossy
    step of the packed representation)."""
    return jnp.round(v * scale) * (1.0 / scale)


def pack_stats(wsum, visits, scale: int):
    """f32, f32 -> i32: [round(wsum * scale) u16 | visits u16].  Lossless
    for wsum already on the 1/scale grid and integer visits."""
    wfix = jnp.round(wsum * scale).astype(jnp.int32)
    return (wfix << 16) | visits.astype(jnp.int32)


def unpack_wsum(packed, scale: int):
    """High half -> f32 (exact: fix * (1/scale) with 1/scale a power of
    two).  Logical shift: the high half may use bit 31."""
    fix = jax.lax.shift_right_logical(packed, 16)
    return fix.astype(jnp.float32) * (1.0 / scale)


def unpack_visits(packed):
    """Low half -> f32."""
    return (packed & np.int32(0xFFFF)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# single-plane (prior | wsum | visits) packing ("packed1")
# ---------------------------------------------------------------------------
# The 2-plane packed walk still gathers TWO planes per action per depth
# step (prior f32 + packed i32).  Since the prior is written once per node
# and only ever *read* by the walk, it can ride in the same i32 word:
#
#     [ prior u11 | wsum * S1 u(21 - bits_v) | visits u(bits_v) ]
#
# with bits_v = bit_length(R) (visits <= R per edge per fresh search) and
# S1 the largest power of two with R * S1 < 2**(21 - bits_v).  At the
# production R = 64: [prior u11 | wsum u14 (S1 = 128) | visits u7].  This
# halves the A-scaled gather work (2 planes -> 1) - the dominant cost of
# the VPU-bound walk on wide boards.
#
# Precision contract (the bit-exact-twin discipline of pack_stats):
#   * leaf values quantized to the 1/S1 grid (quantize_value) - as before,
#     just a coarser grid (1/128 vs 1/512 at R = 64),
#   * prior rows quantized to the 1/2048 grid, clamped to 2047/2048
#     (quantize_prior), applied at the row write,
# and nothing else: visits exact, all f32 sums of on-grid values exact,
# backup still ONE integer add per edge.  The jnp twin applies the same
# two quantizations and matches the kernel bit-exactly.  Like the 2-plane
# form this requires a freshly reset tree (run_mcts's packed guard).

PRIOR_BITS = 11
_PRIOR_GRID = float(1 << PRIOR_BITS)


def packed1_layout(rollouts: int):
    """(bits_v, bits_w, scale) of the 1-plane word for an R-rollout
    search: visits field sized to hold R, wsum field gets the rest below
    the u11 prior, scale = largest power of two with R * scale fitting
    the wsum field."""
    bits_v = max(1, int(rollouts).bit_length())
    bits_w = 32 - PRIOR_BITS - bits_v
    assert bits_w >= 8, f"rollouts={rollouts} leaves <8 wsum bits"
    s = 1
    while rollouts * (s * 2) < (1 << bits_w):
        s *= 2
    return bits_v, bits_w, s


def quantize_prior(p):
    """Round a prior in [0, 1] to the 1/2048 grid, clamped to 2047/2048
    (1.0 must not overflow the u11 field)."""
    return jnp.minimum(
        jnp.round(p * _PRIOR_GRID), _PRIOR_GRID - 1.0) * (1.0 / _PRIOR_GRID)


def pack1_stats(prior, wsum, visits, layout):
    """f32 x3 -> i32 [prior u11 | wsum fix | visits].  Lossless for
    on-grid prior/wsum and integer visits."""
    bits_v, bits_w, s = layout
    pfix = jnp.minimum(jnp.round(prior * _PRIOR_GRID),
                       _PRIOR_GRID - 1.0).astype(jnp.int32)
    wfix = jnp.round(wsum * s).astype(jnp.int32)
    return (pfix << (bits_v + bits_w)) | (wfix << bits_v) | visits.astype(
        jnp.int32)


def unpack1_prior(packed, layout):
    bits_v, bits_w, _ = layout
    fix = jax.lax.shift_right_logical(packed, bits_v + bits_w)
    return fix.astype(jnp.float32) * (1.0 / _PRIOR_GRID)


def unpack1_wsum(packed, layout):
    bits_v, bits_w, s = layout
    fix = jax.lax.shift_right_logical(packed, bits_v) & np.int32(
        (1 << bits_w) - 1)
    return fix.astype(jnp.float32) * (1.0 / s)


def unpack1_visits(packed, layout):
    bits_v, _, _ = layout
    return (packed & np.int32((1 << bits_v) - 1)).astype(jnp.float32)


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


def _walk(prior_ref, wsum_ref, visits_ref, parent_ref, af_ref,
          expanded_ref, probs_ref,
          nodes_out, actions_out, leaf_out, laction_out, alloc_out,
          rootpi_out, p_scr, w_scr, v_scr,
          *, cpuct, num_actions, max_depth):
    """The root-to-leaf selection walk over VMEM-resident stat refs (shared
    by the read-only select kernel and the fused apply+select kernel, whose
    apply phase mutates the refs before this runs)."""
    A = num_actions
    V = prior_ref.shape[1]
    Gb = prior_ref.shape[2]
    aio = jax.lax.broadcasted_iota(jnp.int32, (A, Gb), 0)
    vio = jax.lax.broadcasted_iota(jnp.int32, (V, Gb), 0)
    viof = vio.astype(jnp.float32)
    nodes_out[:] = jnp.full((max_depth, Gb), -1, jnp.int32)
    actions_out[:] = jnp.zeros((max_depth, Gb), jnp.int32)
    # loop-invariant [V, Gb] planes: expand/backup run outside this kernel,
    # so within one rollout these never change
    expanded = expanded_ref[:]  # f32 {0,1}
    parent = parent_ref[:]  # i32, -1 = unallocated slot
    action_from = af_ref[:]  # i32

    def cond(st):
        d, node, found, leaf_action, needs_alloc = st
        return jnp.logical_and(d < max_depth, jnp.min(found) < 0.5)

    if _narrow(A):
        # keep per-action slices live in registers (fast at tiny A); loads
        # cast bf16 storage to f32 once - all walk math is f32
        prior_s = [prior_ref[a].astype(jnp.float32) for a in range(A)]
        wsum_s = [wsum_ref[a].astype(jnp.float32) for a in range(A)]
        visits_s = [visits_ref[a].astype(jnp.float32) for a in range(A)]

        def gather_rows(node, found):
            """Stat rows of each lane's node: [1, Gb] expanded plus
            ([A, Gb] prior, value-sum, visits)."""
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
            return exp, P, W, Vv
    else:

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
            exp = jnp.sum(expanded * oh, axis=0, keepdims=True)
            for a in range(A):
                p_scr[pl.ds(a, 1)] = jnp.sum(
                    prior_ref[a].astype(jnp.float32) * oh,
                    axis=0, keepdims=True)
                w_scr[pl.ds(a, 1)] = jnp.sum(
                    wsum_ref[a].astype(jnp.float32) * oh,
                    axis=0, keepdims=True)
                v_scr[pl.ds(a, 1)] = jnp.sum(
                    visits_ref[a].astype(jnp.float32) * oh,
                    axis=0, keepdims=True)
            return exp, p_scr[:], w_scr[:], v_scr[:]

    def body(st):
        d, node, found, leaf_action, needs_alloc = st
        exp, P, W, Vv = gather_rows(node, found)
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

        # child under (node, action): every edge is allocated at most once,
        # so the per-node (parent, action_from) scalars determine it - no
        # stored [A, V, G] child table (tree.child_lookup is the jnp twin)
        match = jnp.logical_and(parent == node, action_from == action)
        cid = jnp.sum(
            jnp.where(match, viof, 0.0), axis=0, keepdims=True
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


def _select_kernel(prior_ref, wsum_ref, visits_ref, parent_ref, af_ref,
                   expanded_ref, probs_ref,
                   nodes_out, actions_out, leaf_out, laction_out, alloc_out,
                   rootpi_out, p_scr, w_scr, v_scr,
                   *, cpuct, num_actions, max_depth):
    _walk(prior_ref, wsum_ref, visits_ref, parent_ref, af_ref,
          expanded_ref, probs_ref,
          nodes_out, actions_out, leaf_out, laction_out, alloc_out,
          rootpi_out, p_scr, w_scr, v_scr,
          cpuct=cpuct, num_actions=num_actions, max_depth=max_depth)


def _backup_edges(wsum_out, visits_out, nodes_ref, actions_ref, length,
                  value, *, num_actions):
    """Per recorded path edge: wsum += parity-flipped value, visits += 1 -
    a read-modify-write of only the tile-sized node chunks the edges land
    in (node ids are allocation-ordered: depth 0 is always the root chunk,
    deeper edges span at most the current allocation count).  Chunks are
    one sublane tile of the storage dtype (8 rows f32, 16 rows bf16) so
    every dynamic slice stays tile-aligned; adds run in f32 and round to
    the storage dtype on store - one rounding per edge per rollout, the
    same point the jnp backup twin rounds at."""
    A = num_actions
    V = wsum_out.shape[1]
    Gb = length.shape[1]
    rows = 32 // wsum_out.dtype.itemsize  # sublane tile of the storage
    aio = jax.lax.broadcasted_iota(jnp.int32, (A, Gb), 0)
    sio = jax.lax.broadcasted_iota(jnp.int32, (rows, Gb), 0)
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
        lo_r = (lo // rows) * rows
        nch = hi // rows - lo // rows + 1  # <= 0 if no lane valid at depth d

        def chunk(j, c):
            base = pl.multiple_of(lo_r + j * rows, rows)
            # invalid lanes (node -1) never match a chunk row
            vm = ((sio + base) == nodes).astype(jnp.float32)  # [rows, Gb]
            cw = wsum_out[:, pl.ds(base, rows), :]
            wsum_out[:, pl.ds(base, rows), :] = (
                cw.astype(jnp.float32) + amc[:, None, :] * vm[None]
            ).astype(cw.dtype)
            cv = visits_out[:, pl.ds(base, rows), :]
            visits_out[:, pl.ds(base, rows), :] = (
                cv.astype(jnp.float32) + am[:, None, :] * vm[None]
            ).astype(cv.dtype)
            return c

        jax.lax.fori_loop(0, nch, chunk, 0)
        return _

    jax.lax.fori_loop(0, max_len, body, 0)


def _select_apply_kernel(prior_in, wsum_in, visits_in, parent_ref, af_ref,
                         expanded_ref, probs_ref,
                         pu_nodes, pu_actions, pu_length, pu_value,
                         pu_leaf, pu_newp, pu_write,
                         prior_out, wsum_out, visits_out,
                         nodes_out, actions_out, leaf_out, laction_out,
                         alloc_out, rootpi_out, p_scr, w_scr, v_scr,
                         *, cpuct, num_actions, max_depth):
    """Fused (apply previous rollout's expand+backup) -> (this rollout's
    selection walk).

    The rollout pipeline defers each rollout's stat writes - the expanded
    leaf's prior row and the path's (value-sum, visits) adds - into the
    NEXT rollout's select, which already streams those stat blocks through
    VMEM.  Applying the pending update to the VMEM-resident blocks (and
    writing the blocks back out through input/output aliasing) makes the
    whole per-rollout tree work cost ONE stat read + ONE stat write: the
    standalone backup kernel's extra read+write of (wsum, visits) and the
    jnp expand's full [A, V, G] prior rewrite disappear.  Identical math,
    identical results - only the moment the writes land in HBM moves, and
    nothing reads the stats between a rollout's backup and the next
    rollout's select (run_mcts flushes the last rollout's update after the
    scan)."""
    A = num_actions
    V = prior_in.shape[1]
    Gb = prior_in.shape[2]

    # copy-through: the walk below reads the *_out refs, so it sees the
    # applied update; rows the update misses keep their input values
    prior_out[:] = prior_in[:]
    wsum_out[:] = wsum_in[:]
    visits_out[:] = visits_in[:]

    # --- pending prior-row write (the deferred expand, search.expand) ---
    pleaf = pu_leaf[:]  # [1, Gb] i32
    # A full tree (next_idx == V) yields leaf == V: no slot was allocated,
    # so nothing may be written.  Masking write (rather than clamping hi)
    # keeps the chunk loop from ever forming an out-of-range pl.ds base
    # whose clamped store would land on the last tile's rows with a mask
    # computed from the unclamped base (corrupting that tile's prior rows).
    write = jnp.where(pleaf < V, pu_write[:], 0.0)  # [1, Gb] f32 {0,1}
    newp = pu_newp[:]  # [A, Gb] f32
    rows = 32 // prior_out.dtype.itemsize  # sublane tile of the storage
    sio = jax.lax.broadcasted_iota(jnp.int32, (rows, Gb), 0)
    lo = jnp.min(jnp.where(write > 0, pleaf, V - 1))
    hi = jnp.max(jnp.where(write > 0, pleaf, 0))
    hi = jnp.minimum(hi, V - 1)
    lo_r = (lo // rows) * rows
    nch = hi // rows - lo // rows + 1  # <= 0 when no lane writes

    def pchunk(j, c):
        base = pl.multiple_of(lo_r + j * rows, rows)
        m = jnp.logical_and((sio + base) == pleaf, write > 0)  # [rows, Gb]
        cur = prior_out[:, pl.ds(base, rows), :]
        # written rows round newp to the storage dtype (the same cast
        # tree.scatter_stat applies); untouched rows round-trip exactly
        prior_out[:, pl.ds(base, rows), :] = jnp.where(
            m[None], newp[:, None, :], cur.astype(jnp.float32)
        ).astype(cur.dtype)
        return c

    jax.lax.fori_loop(0, nch, pchunk, 0)

    # --- pending path edge updates (the deferred backup) ---
    _backup_edges(wsum_out, visits_out, pu_nodes, pu_actions,
                  pu_length[:], pu_value[:], num_actions=A)

    _walk(prior_out, wsum_out, visits_out, parent_ref, af_ref,
          expanded_ref, probs_ref,
          nodes_out, actions_out, leaf_out, laction_out, alloc_out,
          rootpi_out, p_scr, w_scr, v_scr,
          cpuct=cpuct, num_actions=num_actions, max_depth=max_depth)


@functools.partial(jax.jit, static_argnames=("cpuct", "interpret", "vseg"))
def select_pallas(prior, wsum, visits, parent, action_from, expanded, probs,
                  cpuct: float, interpret: bool = False,
                  vseg: int | None = None):
    """(path_nodes, path_actions, node, leaf_action, needs_alloc, root_pi):
    the per-rollout selection walk in one kernel.  probs: f32[D, G].
    parent/action_from: i32[V, G] - the walk derives each child id from
    them (see tree.child_lookup); no child table is read or stored.

    ``vseg`` (a multiple of 8 <= V) bounds the node rows the kernel streams
    from HBM to the first ``vseg``: node ids are allocation-ordered (<= 1
    alloc per rollout), so rollout r only ever reads rows <= r - the
    segmented rollout loop in search.run_mcts exploits this to cut the
    dominant HBM stream of early rollouts (the tree "grows" through
    kernel-visible segments while living in one fixed allocation).

    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend) - the CI parity path (tests/test_pallas.py)."""
    interpret = interpret or bool(os.environ.get("ALPHATPU_FORCE_INTERPRET"))
    A, V, G = prior.shape
    D = probs.shape[0]
    isz = prior.dtype.itemsize
    Vb = vseg or V
    assert Vb % (32 // isz) == 0 and Vb <= V
    Gb = games_block(A, V, G, isz)
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
        in_specs=[stat_spec, stat_spec, stat_spec, vg_spec, vg_spec, vg_spec,
                  dg_spec],
        out_specs=(dg_spec, dg_spec, row_spec, row_spec, row_spec, ag_spec),
        scratch_shapes=[pltpu.VMEM((A, Gb), jnp.float32)] * 3,
        compiler_params=_compiler_params(A, V, G, isz),
        interpret=interpret,
        # expanded travels as f32 (i8 tiles are 32-sublane); parent and
        # action_from are i32 [V, G] planes - 2/A the bytes of the child
        # stat block they replace.
    )(prior, wsum, visits, parent, action_from,
      expanded.astype(jnp.float32), probs)
    return nodes, actions, node[0], laction[0], alloc[0] != 0, rootpi


@functools.partial(jax.jit, static_argnames=("cpuct", "interpret", "vseg"),
                   donate_argnums=(0, 1, 2))
def select_apply_pallas(prior, wsum, visits, parent, action_from, expanded,
                        probs, pu_nodes, pu_actions, pu_length, pu_value,
                        pu_leaf, pu_newp, pu_write, cpuct: float,
                        interpret: bool = False, vseg: int | None = None):
    """Fused previous-rollout stat update + this rollout's selection walk.

    Returns ``(prior', wsum', visits', path_nodes, path_actions, node,
    leaf_action, needs_alloc, root_pi)``.  The pending update (``pu_*``) is
    the previous rollout's deferred writes: its recorded path + leaf value
    (the backup) and its expanded leaf id + normalized prior row + write
    mask (the prior write of search.expand).  Pass an empty pending (write
    0, length 0, nodes -1) for the first rollout.  prior/wsum/visits are
    donated and updated in place via input/output aliasing - per rollout
    the stat blocks cross HBM exactly once in and once out."""
    interpret = interpret or bool(os.environ.get("ALPHATPU_FORCE_INTERPRET"))
    A, V, G = prior.shape
    D = probs.shape[0]
    isz = prior.dtype.itemsize
    Vb = vseg or V
    assert Vb % (32 // isz) == 0 and Vb <= V
    Gb = games_block(A, V, G, isz)
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

    (prior2, wsum2, visits2, nodes, actions, node, laction, alloc,
     rootpi) = pl.pallas_call(
        functools.partial(_select_apply_kernel, cpuct=cpuct, num_actions=A,
                          max_depth=D),
        out_shape=(
            jax.ShapeDtypeStruct((A, V, G), prior.dtype),
            jax.ShapeDtypeStruct((A, V, G), wsum.dtype),
            jax.ShapeDtypeStruct((A, V, G), visits.dtype),
            jax.ShapeDtypeStruct((D, G), jnp.int32),
            jax.ShapeDtypeStruct((D, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int8),
            jax.ShapeDtypeStruct((A, G), jnp.float32),
        ),
        grid=grid,
        in_specs=[stat_spec, stat_spec, stat_spec, vg_spec, vg_spec, vg_spec,
                  dg_spec,
                  dg_spec, dg_spec, row_spec, row_spec, row_spec, ag_spec,
                  row_spec],
        out_specs=(stat_spec, stat_spec, stat_spec,
                   dg_spec, dg_spec, row_spec, row_spec, row_spec, ag_spec),
        input_output_aliases={0: 0, 1: 1, 2: 2},
        scratch_shapes=[pltpu.VMEM((A, Gb), jnp.float32)] * 3,
        compiler_params=_compiler_params(A, V, G, isz),
        interpret=interpret,
    )(prior, wsum, visits, parent, action_from,
      expanded.astype(jnp.float32), probs,
      pu_nodes, pu_actions, pu_length[None, :].astype(jnp.int32),
      pu_value[None, :], pu_leaf[None, :].astype(jnp.int32), pu_newp,
      pu_write[None, :].astype(jnp.float32))
    return (prior2, wsum2, visits2, nodes, actions, node[0], laction[0],
            alloc[0] != 0, rootpi)


# ---------------------------------------------------------------------------
# packed-plane fused kernel (the production rollout path)
# ---------------------------------------------------------------------------


def _backup_edges_packed(packed_out, nodes_ref, actions_ref, length, value,
                         *, num_actions, scale, wshift=16):
    """The backup edge updates on the packed (wsum_fix | visits) plane:
    with both halves integers, updating BOTH stats of an edge is ONE
    integer add of ``(contrib * scale) << wshift | 1`` - two vector ops
    per chunk element (mask-multiply + add), cheaper than even the f32
    kernel's two-plane multiply-adds.  ``value`` must already be on the
    1/scale grid (quantize_value), so ``contrib * scale`` is an exact
    integer.  ``wshift`` is the wsum field's bit offset: 16 for the
    2-plane (wsum | visits) word, packed1_layout's bits_v for the 1-plane
    (prior | wsum | visits) word (whose prior field the add can never
    carry into: accumulated wsum * scale <= R * scale < 2**bits_w by
    construction)."""
    A = num_actions
    V = packed_out.shape[1]
    Gb = length.shape[1]
    aio = jax.lax.broadcasted_iota(jnp.int32, (A, Gb), 0)
    sio = jax.lax.broadcasted_iota(jnp.int32, (8, Gb), 0)
    max_len = jnp.max(length)

    def body(d, _):
        nodes = nodes_ref[pl.ds(d, 1), :]  # [1, Gb]; -1 = nothing recorded
        actions = actions_ref[pl.ds(d, 1), :]
        valid = nodes >= 0
        k = length - 1 - d
        contrib = jnp.where(k % 2 == 0, 1.0 - value, value)  # [1, Gb]
        cfix = (contrib * scale).astype(jnp.int32)  # exact grid integers
        am = (aio == actions).astype(jnp.int32)  # [A, Gb]
        adelta = am * ((cfix << wshift) + 1)  # [A, Gb] i32
        lo = jnp.min(jnp.where(valid, nodes, V - 1))
        hi = jnp.max(jnp.where(valid, nodes, 0))
        lo8 = (lo // 8) * 8
        nch = hi // 8 - lo // 8 + 1  # <= 0 if no lane valid at depth d

        def chunk(j, c):
            base = pl.multiple_of(lo8 + j * 8, 8)
            # invalid lanes (node -1) never match a chunk row
            vm = ((sio + base) == nodes).astype(jnp.int32)  # [8, Gb]
            packed_out[:, pl.ds(base, 8), :] += adelta[:, None, :] * vm[None]
            return c

        jax.lax.fori_loop(0, nch, chunk, 0)
        return _

    jax.lax.fori_loop(0, max_len, body, 0)


def _walk_packed(prior_ref, packed_ref, parent_ref, af_ref, expanded_ref,
                 probs_ref, nodes_out, actions_out, leaf_out, laction_out,
                 alloc_out, rootpi_out, p_scr, pk_scr,
                 *, cpuct, num_actions, max_depth, scale):
    """The selection walk over (prior f32, packed u32) stat planes.

    Two structural advantages over :func:`_walk`'s 3-plane form:
    * each depth step gathers TWO planes instead of three (the packed
      plane's one-hot select is an integer where+sum; the [A, Gb] unpack
      afterwards is one AND + one SHIFT per row, not per element),
    * depth 0 is PEELED out of the loop: every lane starts at the root
      (node 0), so the root's rows are static slices - no one-hot gather
      at all for the first step of every rollout (mean walk depth is ~5,
      so this alone removes ~1/5 of the gather work).
    """
    A = num_actions
    V = prior_ref.shape[1]
    Gb = prior_ref.shape[2]
    aio = jax.lax.broadcasted_iota(jnp.int32, (A, Gb), 0)
    vio = jax.lax.broadcasted_iota(jnp.int32, (V, Gb), 0)
    viof = vio.astype(jnp.float32)
    nodes_out[:] = jnp.full((max_depth, Gb), -1, jnp.int32)
    actions_out[:] = jnp.zeros((max_depth, Gb), jnp.int32)
    expanded = expanded_ref[:]  # f32 {0,1}; loop-invariant within a rollout
    parent = parent_ref[:]  # i32, -1 = unallocated slot
    action_from = af_ref[:]  # i32

    def step(d, node, found, leaf_action, needs_alloc, exp, P, W, Vv):
        """One depth step given the gathered rows ([1, Gb] exp, [A, Gb]
        stats); same math as _walk's body."""
        live = (1.0 - found) * exp
        Q = jnp.where(Vv > 0, W / jnp.maximum(Vv, 1.0), 0.0)
        PI = _node_policy_2d(P, Q, Vv, cpuct=cpuct)
        prob = probs_ref[pl.ds(d, 1), :]
        action = _cdf_sample_2d(PI, prob, aio, A)
        nodes_out[pl.ds(d, 1), :] = jnp.where(live > 0.5, node, -1)
        actions_out[pl.ds(d, 1), :] = jnp.where(live > 0.5, action, 0)
        match = jnp.logical_and(parent == node, action_from == action)
        cid = jnp.sum(
            jnp.where(match, viof, 0.0), axis=0, keepdims=True
        ).astype(jnp.int32)
        hit_missing = live * (cid == 0).astype(jnp.float32)
        leaf_action = jnp.where(hit_missing > 0.5, action, leaf_action)
        needs_alloc = jnp.maximum(needs_alloc, hit_missing)
        found = jnp.maximum(found, jnp.maximum(1.0 - exp, hit_missing))
        stepm = (live * (cid > 0).astype(jnp.float32)) > 0.5
        node = jnp.where(stepm, cid, node)
        return node, found, leaf_action, needs_alloc, PI

    # ---- depth 0 (peeled): all lanes at node 0, static row loads ----
    if _narrow(A):
        P0 = jnp.concatenate(
            [prior_ref[a, 0:1, :] for a in range(A)], axis=0)
        PK0 = jnp.concatenate(
            [packed_ref[a, 0:1, :] for a in range(A)], axis=0)
    else:
        # wide: route through the gather scratch (the same store pattern
        # the per-depth gather uses) instead of concatenating A row values
        for a in range(A):
            p_scr[pl.ds(a, 1)] = prior_ref[a, 0:1, :]
            pk_scr[pl.ds(a, 1)] = packed_ref[a, 0:1, :]
        P0 = p_scr[:]
        PK0 = pk_scr[:]
    node0 = jnp.zeros((1, Gb), jnp.int32)
    zf = jnp.zeros((1, Gb), jnp.float32)
    node, found, leaf_action, needs_alloc, PI0 = step(
        0, node0, zf, jnp.zeros((1, Gb), jnp.int32), zf,
        expanded[0:1, :], P0, unpack_wsum(PK0, scale), unpack_visits(PK0),
    )
    rootpi_out[:] = PI0

    # ---- depths >= 1: one-hot gathers over the (two) stat planes ----
    if _narrow(A):
        prior_s = [prior_ref[a] for a in range(A)]
        packed_s = [packed_ref[a] for a in range(A)]

        def gather_rows(node):
            oh = vio == node  # bool [V, Gb]
            ohf = oh.astype(jnp.float32)
            exp = jnp.sum(expanded * ohf, axis=0, keepdims=True)
            P = jnp.concatenate(
                [jnp.sum(prior_s[a] * ohf, axis=0, keepdims=True)
                 for a in range(A)], axis=0)
            PK = jnp.concatenate(
                [jnp.sum(jnp.where(oh, packed_s[a], 0),
                         axis=0, keepdims=True)
                 for a in range(A)], axis=0)
            return exp, P, PK
    else:

        def gather_rows(node):
            oh = vio == node
            ohf = oh.astype(jnp.float32)
            exp = jnp.sum(expanded * ohf, axis=0, keepdims=True)
            for a in range(A):
                p_scr[pl.ds(a, 1)] = jnp.sum(
                    prior_ref[a] * ohf, axis=0, keepdims=True)
                pk_scr[pl.ds(a, 1)] = jnp.sum(
                    jnp.where(oh, packed_ref[a], 0),
                    axis=0, keepdims=True)
            return exp, p_scr[:], pk_scr[:]

    def cond(st):
        d, node, found, leaf_action, needs_alloc = st
        return jnp.logical_and(d < max_depth, jnp.min(found) < 0.5)

    def body(st):
        d, node, found, leaf_action, needs_alloc = st
        exp, P, PK = gather_rows(node)
        node, found, leaf_action, needs_alloc, _ = step(
            d, node, found, leaf_action, needs_alloc,
            exp, P, unpack_wsum(PK, scale), unpack_visits(PK),
        )
        return d + 1, node, found, leaf_action, needs_alloc

    _, node, _, leaf_action, needs_alloc = jax.lax.while_loop(
        cond, body, (jnp.int32(1), node, found, leaf_action, needs_alloc))
    leaf_out[:] = node
    laction_out[:] = leaf_action
    alloc_out[:] = needs_alloc.astype(jnp.int8)


def _select_apply_packed_kernel(prior_in, packed_in, parent_ref, af_ref,
                                expanded_ref, probs_ref,
                                pu_nodes, pu_actions, pu_length, pu_value,
                                pu_leaf, pu_newp, pu_write,
                                prior_out, packed_out,
                                nodes_out, actions_out, leaf_out,
                                laction_out, alloc_out, rootpi_out,
                                p_scr, pk_scr,
                                *, cpuct, num_actions, max_depth, scale):
    """Packed-plane version of :func:`_select_apply_kernel`: apply the
    previous rollout's deferred writes (prior row + packed backup adds) to
    the VMEM-resident blocks, write back through aliasing, then run this
    rollout's peeled walk."""
    A = num_actions
    V = prior_in.shape[1]
    Gb = prior_in.shape[2]

    prior_out[:] = prior_in[:]
    packed_out[:] = packed_in[:]

    # --- pending prior-row write (identical to _select_apply_kernel) ---
    pleaf = pu_leaf[:]  # [1, Gb] i32
    write = jnp.where(pleaf < V, pu_write[:], 0.0)  # full-tree guard
    newp = pu_newp[:]  # [A, Gb] f32
    sio = jax.lax.broadcasted_iota(jnp.int32, (8, Gb), 0)
    lo = jnp.min(jnp.where(write > 0, pleaf, V - 1))
    hi = jnp.max(jnp.where(write > 0, pleaf, 0))
    hi = jnp.minimum(hi, V - 1)
    lo8 = (lo // 8) * 8
    nch = hi // 8 - lo // 8 + 1  # <= 0 when no lane writes

    def pchunk(j, c):
        base = pl.multiple_of(lo8 + j * 8, 8)
        m = jnp.logical_and((sio + base) == pleaf, write > 0)  # [8, Gb]
        cur = prior_out[:, pl.ds(base, 8), :]
        prior_out[:, pl.ds(base, 8), :] = jnp.where(
            m[None], newp[:, None, :], cur)
        return c

    jax.lax.fori_loop(0, nch, pchunk, 0)

    # --- pending path edge updates on the packed plane ---
    _backup_edges_packed(packed_out, pu_nodes, pu_actions,
                         pu_length[:], pu_value[:], num_actions=A,
                         scale=scale)

    _walk_packed(prior_out, packed_out, parent_ref, af_ref, expanded_ref,
                 probs_ref, nodes_out, actions_out, leaf_out, laction_out,
                 alloc_out, rootpi_out, p_scr, pk_scr,
                 cpuct=cpuct, num_actions=num_actions, max_depth=max_depth,
                 scale=scale)


@functools.partial(jax.jit,
                   static_argnames=("cpuct", "scale", "interpret", "vseg"),
                   donate_argnums=(0, 1))
def select_apply_packed(prior, packed, parent, action_from, expanded,
                        probs, pu_nodes, pu_actions, pu_length, pu_value,
                        pu_leaf, pu_newp, pu_write, cpuct: float,
                        scale: int = 512,
                        interpret: bool = False, vseg: int | None = None):
    """Fused previous-rollout stat update + this rollout's selection walk
    on the packed stat representation: ``prior`` f32[A, V, G] plus ONE
    ``packed`` i32[A, V, G] plane holding (wsum | visits) as
    u16 fixed-point (wsum * scale) | u16 integer (visits) halves
    (see :func:`pack_stats`).

    Returns ``(prior', packed', path_nodes, path_actions, node,
    leaf_action, needs_alloc, root_pi)``.  Versus
    :func:`select_apply_pallas`: one third less data gathered per walk
    depth step AND one third less HBM streamed per rollout, at the cost of
    leaf values quantized to the 1/scale fixed-point grid (visits stay
    exact; the numerical contract and its bit-exact jnp twin are described
    at :func:`pack_stats`)."""
    interpret = interpret or bool(os.environ.get("ALPHATPU_FORCE_INTERPRET"))
    A, V, G = prior.shape
    D = probs.shape[0]
    assert D >= 1
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

    (prior2, packed2, nodes, actions, node, laction, alloc,
     rootpi) = pl.pallas_call(
        functools.partial(_select_apply_packed_kernel, cpuct=cpuct,
                          num_actions=A, max_depth=D, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((A, V, G), jnp.float32),
            jax.ShapeDtypeStruct((A, V, G), jnp.int32),
            jax.ShapeDtypeStruct((D, G), jnp.int32),
            jax.ShapeDtypeStruct((D, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int8),
            jax.ShapeDtypeStruct((A, G), jnp.float32),
        ),
        grid=grid,
        in_specs=[stat_spec, stat_spec, vg_spec, vg_spec, vg_spec, dg_spec,
                  dg_spec, dg_spec, row_spec, row_spec, row_spec, ag_spec,
                  row_spec],
        out_specs=(stat_spec, stat_spec,
                   dg_spec, dg_spec, row_spec, row_spec, row_spec, ag_spec),
        input_output_aliases={0: 0, 1: 1},
        scratch_shapes=[pltpu.VMEM((A, Gb), jnp.float32),
                        pltpu.VMEM((A, Gb), jnp.int32)],
        compiler_params=_compiler_params(A, V, G),
        interpret=interpret,
    )(prior, packed, parent, action_from,
      expanded.astype(jnp.float32), probs,
      pu_nodes, pu_actions, pu_length[None, :].astype(jnp.int32),
      pu_value[None, :], pu_leaf[None, :].astype(jnp.int32), pu_newp,
      pu_write[None, :].astype(jnp.float32))
    return (prior2, packed2, nodes, actions, node[0], laction[0],
            alloc[0] != 0, rootpi)


def _walk_packed1(packed_ref, parent_ref, af_ref, expanded_ref,
                  probs_ref, nodes_out, actions_out, leaf_out, laction_out,
                  alloc_out, rootpi_out, pk_scr,
                  *, cpuct, num_actions, max_depth, layout):
    """:func:`_walk_packed` on the 1-plane (prior | wsum | visits) word:
    ONE gathered plane per action per depth step - the prior rides in the
    same i32 and is unpacked per [A, Gb] row (two shift+mask+converts per
    row, not per element).  Same peeled depth 0, same walk math."""
    A = num_actions
    V = packed_ref.shape[1]
    Gb = packed_ref.shape[2]
    bits_v, bits_w, s = layout
    mask_w = np.int32((1 << bits_w) - 1)
    mask_v = np.int32((1 << bits_v) - 1)
    aio = jax.lax.broadcasted_iota(jnp.int32, (A, Gb), 0)
    vio = jax.lax.broadcasted_iota(jnp.int32, (V, Gb), 0)
    viof = vio.astype(jnp.float32)
    nodes_out[:] = jnp.full((max_depth, Gb), -1, jnp.int32)
    actions_out[:] = jnp.zeros((max_depth, Gb), jnp.int32)
    expanded = expanded_ref[:]  # f32 {0,1}; loop-invariant within a rollout
    parent = parent_ref[:]  # i32, -1 = unallocated slot
    action_from = af_ref[:]  # i32

    def unpack_rows(PK):
        """[A, Gb] i32 -> (P, W, Vv) f32 rows."""
        P = jax.lax.shift_right_logical(PK, bits_v + bits_w).astype(
            jnp.float32) * (1.0 / _PRIOR_GRID)
        W = (jax.lax.shift_right_logical(PK, bits_v) & mask_w).astype(
            jnp.float32) * (1.0 / s)
        Vv = (PK & mask_v).astype(jnp.float32)
        return P, W, Vv

    def step(d, node, found, leaf_action, needs_alloc, exp, P, W, Vv):
        live = (1.0 - found) * exp
        Q = jnp.where(Vv > 0, W / jnp.maximum(Vv, 1.0), 0.0)
        PI = _node_policy_2d(P, Q, Vv, cpuct=cpuct)
        prob = probs_ref[pl.ds(d, 1), :]
        action = _cdf_sample_2d(PI, prob, aio, A)
        nodes_out[pl.ds(d, 1), :] = jnp.where(live > 0.5, node, -1)
        actions_out[pl.ds(d, 1), :] = jnp.where(live > 0.5, action, 0)
        match = jnp.logical_and(parent == node, action_from == action)
        cid = jnp.sum(
            jnp.where(match, viof, 0.0), axis=0, keepdims=True
        ).astype(jnp.int32)
        hit_missing = live * (cid == 0).astype(jnp.float32)
        leaf_action = jnp.where(hit_missing > 0.5, action, leaf_action)
        needs_alloc = jnp.maximum(needs_alloc, hit_missing)
        found = jnp.maximum(found, jnp.maximum(1.0 - exp, hit_missing))
        stepm = (live * (cid > 0).astype(jnp.float32)) > 0.5
        node = jnp.where(stepm, cid, node)
        return node, found, leaf_action, needs_alloc, PI

    # ---- depth 0 (peeled): all lanes at node 0, static row loads ----
    if _narrow(A):
        PK0 = jnp.concatenate(
            [packed_ref[a, 0:1, :] for a in range(A)], axis=0)
    else:
        for a in range(A):
            pk_scr[pl.ds(a, 1)] = packed_ref[a, 0:1, :]
        PK0 = pk_scr[:]
    node0 = jnp.zeros((1, Gb), jnp.int32)
    zf = jnp.zeros((1, Gb), jnp.float32)
    node, found, leaf_action, needs_alloc, PI0 = step(
        0, node0, zf, jnp.zeros((1, Gb), jnp.int32), zf,
        expanded[0:1, :], *unpack_rows(PK0),
    )
    rootpi_out[:] = PI0

    # ---- depths >= 1: ONE one-hot gathered plane ----
    if _narrow(A):
        packed_s = [packed_ref[a] for a in range(A)]

        def gather_rows(node):
            oh = vio == node  # bool [V, Gb]
            exp = jnp.sum(expanded * oh.astype(jnp.float32),
                          axis=0, keepdims=True)
            PK = jnp.concatenate(
                [jnp.sum(jnp.where(oh, packed_s[a], 0),
                         axis=0, keepdims=True)
                 for a in range(A)], axis=0)
            return exp, PK
    else:

        def gather_rows(node):
            oh = vio == node
            exp = jnp.sum(expanded * oh.astype(jnp.float32),
                          axis=0, keepdims=True)
            for a in range(A):
                pk_scr[pl.ds(a, 1)] = jnp.sum(
                    jnp.where(oh, packed_ref[a], 0),
                    axis=0, keepdims=True)
            return exp, pk_scr[:]

    def cond(st):
        d, node, found, leaf_action, needs_alloc = st
        return jnp.logical_and(d < max_depth, jnp.min(found) < 0.5)

    def body(st):
        d, node, found, leaf_action, needs_alloc = st
        exp, PK = gather_rows(node)
        node, found, leaf_action, needs_alloc, _ = step(
            d, node, found, leaf_action, needs_alloc, exp, *unpack_rows(PK))
        return d + 1, node, found, leaf_action, needs_alloc

    init = (
        jnp.int32(1),
        node,
        found,
        leaf_action,
        needs_alloc,
    )
    _, node, _, leaf_action, needs_alloc = jax.lax.while_loop(
        cond, body, init)
    leaf_out[:] = node
    laction_out[:] = leaf_action
    alloc_out[:] = needs_alloc.astype(jnp.int8)


def _select_apply_packed1_kernel(packed_in, parent_ref, af_ref,
                                 expanded_ref, probs_ref,
                                 pu_nodes, pu_actions, pu_length, pu_value,
                                 pu_leaf, pu_newp, pu_write,
                                 packed_out,
                                 nodes_out, actions_out, leaf_out,
                                 laction_out, alloc_out, rootpi_out,
                                 pk_scr,
                                 *, cpuct, num_actions, max_depth, layout):
    """1-plane version of :func:`_select_apply_packed_kernel`: the pending
    prior-row write packs the quantized row into the word's u11 field (a
    fresh row, so wsum = visits = 0), the pending backup adds land at the
    layout's wsum offset, then the single-plane peeled walk runs."""
    A = num_actions
    V = packed_in.shape[1]
    Gb = packed_in.shape[2]
    bits_v, bits_w, s = layout

    packed_out[:] = packed_in[:]

    # --- pending prior-row write (quantize -> pack, stats zero) ---
    pleaf = pu_leaf[:]  # [1, Gb] i32
    write = jnp.where(pleaf < V, pu_write[:], 0.0)  # full-tree guard
    newp = pu_newp[:]  # [A, Gb] f32
    pfix = jnp.minimum(jnp.round(newp * _PRIOR_GRID),
                       _PRIOR_GRID - 1.0).astype(jnp.int32)
    prow = pfix << (bits_v + bits_w)  # [A, Gb] packed fresh row
    sio = jax.lax.broadcasted_iota(jnp.int32, (8, Gb), 0)
    lo = jnp.min(jnp.where(write > 0, pleaf, V - 1))
    hi = jnp.max(jnp.where(write > 0, pleaf, 0))
    hi = jnp.minimum(hi, V - 1)
    lo8 = (lo // 8) * 8
    nch = hi // 8 - lo // 8 + 1  # <= 0 when no lane writes

    def pchunk(j, c):
        base = pl.multiple_of(lo8 + j * 8, 8)
        m = jnp.logical_and((sio + base) == pleaf, write > 0)  # [8, Gb]
        cur = packed_out[:, pl.ds(base, 8), :]
        packed_out[:, pl.ds(base, 8), :] = jnp.where(
            m[None], prow[:, None, :], cur)
        return c

    jax.lax.fori_loop(0, nch, pchunk, 0)

    # --- pending path edge updates (wsum field at offset bits_v) ---
    _backup_edges_packed(packed_out, pu_nodes, pu_actions,
                         pu_length[:], pu_value[:], num_actions=A,
                         scale=s, wshift=bits_v)

    _walk_packed1(packed_out, parent_ref, af_ref, expanded_ref,
                  probs_ref, nodes_out, actions_out, leaf_out, laction_out,
                  alloc_out, rootpi_out, pk_scr,
                  cpuct=cpuct, num_actions=num_actions,
                  max_depth=max_depth, layout=layout)


@functools.partial(jax.jit,
                   static_argnames=("cpuct", "layout", "interpret", "vseg"),
                   donate_argnums=(0,))
def select_apply_packed1(packed, parent, action_from, expanded,
                         probs, pu_nodes, pu_actions, pu_length, pu_value,
                         pu_leaf, pu_newp, pu_write, cpuct: float,
                         layout=(7, 14, 128),
                         interpret: bool = False, vseg: int | None = None):
    """Fused previous-rollout stat update + selection walk on the 1-plane
    representation: a single ``packed`` i32[A, V, G] plane holding
    (prior u11 | wsum fixed-point | visits) per packed1_layout.  Halves
    the walk's gathered data AND the per-rollout stat stream vs the
    2-plane form; quantization contract at the packed1 section header.

    Returns ``(packed', path_nodes, path_actions, node, leaf_action,
    needs_alloc, root_pi)``."""
    interpret = interpret or bool(os.environ.get("ALPHATPU_FORCE_INTERPRET"))
    A, V, G = packed.shape
    D = probs.shape[0]
    assert D >= 1
    Vb = vseg or V
    assert Vb % 8 == 0 and Vb <= V
    Gb = games_block(A, V, G, budget_blocks=PACKED1_BLOCKS)
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

    (packed2, nodes, actions, node, laction, alloc,
     rootpi) = pl.pallas_call(
        functools.partial(_select_apply_packed1_kernel, cpuct=cpuct,
                          num_actions=A, max_depth=D, layout=layout),
        out_shape=(
            jax.ShapeDtypeStruct((A, V, G), jnp.int32),
            jax.ShapeDtypeStruct((D, G), jnp.int32),
            jax.ShapeDtypeStruct((D, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int8),
            jax.ShapeDtypeStruct((A, G), jnp.float32),
        ),
        grid=grid,
        in_specs=[stat_spec, vg_spec, vg_spec, vg_spec, dg_spec,
                  dg_spec, dg_spec, row_spec, row_spec, row_spec, ag_spec,
                  row_spec],
        out_specs=(stat_spec,
                   dg_spec, dg_spec, row_spec, row_spec, row_spec, ag_spec),
        input_output_aliases={0: 0},
        scratch_shapes=[pltpu.VMEM((A, Gb), jnp.int32)],
        compiler_params=_compiler_params(A, V, G),
        interpret=interpret,
    )(packed, parent, action_from,
      expanded.astype(jnp.float32), probs,
      pu_nodes, pu_actions, pu_length[None, :].astype(jnp.int32),
      pu_value[None, :], pu_leaf[None, :].astype(jnp.int32), pu_newp,
      pu_write[None, :].astype(jnp.float32))
    return (packed2, nodes, actions, node[0], laction[0],
            alloc[0] != 0, rootpi)


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
    only the 8-sublane node chunks its edges actually land in
    (_backup_edges).  The production rollout pipeline fuses this into the
    next rollout's select (_select_apply_kernel); this standalone kernel
    remains for the post-scan flush and pre-grown-tree searches."""
    wsum_out[:] = wsum_in[:]
    visits_out[:] = visits_in[:]
    _backup_edges(wsum_out, visits_out, nodes_ref, actions_ref,
                  length_ref[:], value_ref[:], num_actions=num_actions)


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
    interpret = interpret or bool(os.environ.get("ALPHATPU_FORCE_INTERPRET"))
    A, V, G = wsum.shape
    D = path_nodes.shape[0]
    isz = wsum.dtype.itemsize
    Vb = vseg or V
    assert Vb % (32 // isz) == 0 and Vb <= V
    Gb = games_block(A, V, G, isz)
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
            jax.ShapeDtypeStruct((A, V, G), wsum.dtype),
            jax.ShapeDtypeStruct((A, V, G), visits.dtype),
        ),
        grid=grid,
        in_specs=[dg_spec, dg_spec, row_spec, row_spec,
                  stat_spec, stat_spec],
        out_specs=(stat_spec, stat_spec),
        input_output_aliases={4: 0, 5: 1},
        compiler_params=_compiler_params(A, V, G, isz),
        interpret=interpret,
    )(
        path_nodes, path_actions, path_length[None, :],
        leaf_value[None, :], wsum, visits,
    )
    return w2, v2
