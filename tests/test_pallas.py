"""Pallas kernel parity in CI: select_pallas / backup_pallas run under the
Pallas interpreter on CPU against the jnp reference implementations on
identical trees and uniform streams.

This is the twin-engine cross-check pattern of the reference (fast_mcts.jl
vs mcts_gpu.jl) applied to the kernel layer: a kernel numerics regression
turns into a red pytest here instead of a broken TPU run discovered later.
The on-chip counterpart (real Mosaic compilation, real tiles) is
benchmarks/kernel_parity.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphatpu.games import make_game
from alphatpu.mcts.pallas_kernels import backup_pallas, select_pallas
from alphatpu.mcts.search import backup, descend, run_mcts
from alphatpu.mcts.tree import init_tree, stat_dtype_for
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import broadcast_initial

CPUCT = 1.5


def _grown_tree(game_name, G, rollouts, seed=0):
    """A realistic mid-search tree: run the jnp engine for ``rollouts``."""
    game = make_game(game_name)
    params = init_params(
        jax.random.key(seed), config_for_game(game, width=32, depth=2)
    )
    positions = broadcast_initial(game, G)
    tree = init_tree(game, positions, rollouts)
    tree, _ = run_mcts(
        game, apply_inference, params, tree, jax.random.key(seed + 1),
        rollouts=rollouts - 2,  # leave free slots so needs_alloc still fires
        cpuct=CPUCT, training=True,
    )
    return game, tree


# tictactoe (A=9) exercises the narrow register path; hex5 (A=25) the wide
# VMEM-scratch path.  G must be a games_block multiple; V a multiple of 8.
# The V=64 case is the production node-pool size: descend walks reach
# depths whose backup paths span multiple 8-sublane node chunks, covering
# the live-chunk fori_loop in _backup_kernel at realistic spans.
@pytest.mark.parametrize("game_name,G,V", [
    ("tictactoe", 256, 16),
    ("hex5", 128, 16),
    ("hex5", 128, 64),
])
def test_select_kernel_matches_jnp(game_name, G, V):
    game, tree = _grown_tree(game_name, G, V)
    D = min(game.max_game_length, tree.num_nodes)
    probs = jax.random.uniform(jax.random.key(42), (D, G))

    path, node, leaf_action, needs_alloc, root_pi = descend(
        game, tree, probs, CPUCT
    )
    (k_nodes, k_actions, k_node, k_laction, k_alloc, k_rootpi) = select_pallas(
        tree.prior, tree.wsum, tree.visits, tree.parent, tree.action_from,
        tree.expanded, probs, CPUCT, interpret=True,
    )

    np.testing.assert_allclose(
        np.asarray(k_rootpi), np.asarray(root_pi), rtol=1e-6, atol=1e-7
    )
    # action choices may diverge only at exact FP prefix-sum ties
    # (Hillis-Steele vs cumsum accumulation order) - with random uniforms
    # that event has ~zero probability, so exact equality is asserted.
    np.testing.assert_array_equal(np.asarray(k_nodes), np.asarray(path.nodes))
    np.testing.assert_array_equal(
        np.asarray(k_actions * (k_nodes >= 0)),
        np.asarray(path.actions * (path.nodes >= 0)),
    )
    np.testing.assert_array_equal(np.asarray(k_node), np.asarray(node))
    np.testing.assert_array_equal(np.asarray(k_alloc), np.asarray(needs_alloc))
    np.testing.assert_array_equal(
        np.asarray(jnp.where(needs_alloc, k_laction, 0)),
        np.asarray(jnp.where(needs_alloc, leaf_action, 0)),
    )


@pytest.mark.parametrize("game_name,G,V", [
    ("tictactoe", 256, 16),
    ("hex5", 128, 16),
    ("hex5", 128, 64),
])
def test_backup_kernel_matches_jnp(game_name, G, V):
    game, tree = _grown_tree(game_name, G, V)
    D = min(game.max_game_length, tree.num_nodes)
    probs = jax.random.uniform(jax.random.key(7), (D, G))
    path, node, leaf_action, needs_alloc, _ = descend(game, tree, probs, CPUCT)

    leaf_value = jax.random.uniform(jax.random.key(8), (G,))
    done = jnp.zeros((G,), bool)
    result = jnp.zeros((G,), jnp.int8)
    player = jnp.ones((G,), jnp.int8)

    ref = backup(tree, path, player, leaf_value, done, result)
    k_wsum, k_visits = backup_pallas(
        tree.wsum, tree.visits, path.nodes, path.actions, path.length,
        leaf_value, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(k_wsum), np.asarray(ref.wsum), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(k_visits), np.asarray(ref.visits))


@pytest.mark.parametrize("game_name,G,V,vseg", [
    ("tictactoe", 256, 16, 8),
    ("hex5", 128, 64, 16),
])
def test_vseg_kernels_match_full(game_name, G, V, vseg):
    """Segmented node-span kernels == full-span kernels when the tree's
    live span fits the segment: grow only vseg-2 nodes, then compare
    select and backup outputs at vseg vs full V (incl. preservation of the
    untouched rows >= vseg through backup's aliasing)."""
    game, tree = _grown_tree(game_name, G, vseg)  # live ids < vseg - 1
    # re-house the grown stats in a V-node pool (rows >= vseg are zeros)
    if V > vseg:
        pad = [(0, 0), (0, V - vseg), (0, 0)]
        tree = tree._replace(
            prior=jnp.pad(tree.prior, pad),
            wsum=jnp.pad(tree.wsum, pad),
            visits=jnp.pad(tree.visits, pad),
            # unallocated slots must hold parent -1 (a 0 pad would make the
            # padded rows claim to be children of the root)
            parent=jnp.pad(tree.parent, [(0, V - vseg), (0, 0)],
                           constant_values=-1),
            action_from=jnp.pad(tree.action_from, [(0, V - vseg), (0, 0)]),
            expanded=jnp.pad(tree.expanded, [(0, V - vseg), (0, 0)]),
            states=jax.tree.map(
                lambda s: jnp.pad(
                    s, [(0, 0), (0, V - vseg)] + [(0, 0)] * (s.ndim - 2)
                ),
                tree.states,
            ),
        )
    D = min(game.max_game_length, vseg)
    probs = jax.random.uniform(jax.random.key(42), (D, G))

    full = select_pallas(tree.prior, tree.wsum, tree.visits, tree.parent,
                         tree.action_from, tree.expanded, probs, CPUCT,
                         interpret=True)
    seg = select_pallas(tree.prior, tree.wsum, tree.visits, tree.parent,
                        tree.action_from, tree.expanded, probs, CPUCT,
                        interpret=True, vseg=vseg)
    for a, b in zip(full, seg):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    nodes, actions = full[0], full[1]
    length = (nodes >= 0).sum(0).astype(jnp.int32)
    leaf_value = jax.random.uniform(jax.random.key(8), (G,))
    # poison the rows >= vseg to prove they pass through backup untouched
    poison_w = tree.wsum.at[:, vseg:, :].set(7.25)
    poison_v = tree.visits.at[:, vseg:, :].set(3.0)
    w_full, v_full = backup_pallas(poison_w, poison_v, nodes, actions,
                                   length, leaf_value, interpret=True)
    w_seg, v_seg = backup_pallas(poison_w, poison_v, nodes, actions,
                                 length, leaf_value, interpret=True,
                                 vseg=vseg)
    np.testing.assert_array_equal(np.asarray(w_seg), np.asarray(w_full))
    np.testing.assert_array_equal(np.asarray(v_seg), np.asarray(v_full))
    np.testing.assert_array_equal(np.asarray(w_seg[:, vseg:, :]), 7.25)


@pytest.mark.parametrize("game_name,G,V", [
    ("tictactoe", 256, 16),
    ("hex5", 256, 32),
])
def test_fused_pipeline_matches_jnp(game_name, G, V, monkeypatch):
    """The pipelined rollout loop (deferred expand/backup applied inside
    the next select via select_apply_pallas, interpret mode) produces the
    SAME final tree and root policy as the jnp reference schedule - the
    fusion moves only when writes land in HBM, not any math.  Uniform
    streams are injected so both paths sample identical actions."""
    game = make_game(game_name)
    params = init_params(
        jax.random.key(3), config_for_game(game, width=32, depth=2)
    )
    positions = broadcast_initial(game, G)
    tree0 = init_tree(game, positions, V)
    D = min(game.max_game_length, V)
    R = V - 2
    probs = jax.random.uniform(jax.random.key(11), (R, D, G))

    monkeypatch.setenv("ALPHATPU_NO_KERNELS", "1")
    ref_tree, ref_pi = run_mcts(
        game, apply_inference, params, tree0, None,
        rollouts=R, cpuct=CPUCT, training=True, probs=probs,
        packed_stats=False,
    )
    monkeypatch.delenv("ALPHATPU_NO_KERNELS")
    monkeypatch.setenv("ALPHATPU_FORCE_INTERPRET", "1")
    fused_tree, fused_pi = run_mcts(
        game, apply_inference, params, tree0, None,
        rollouts=R, cpuct=CPUCT, training=True, probs=probs,
        packed_stats=False,
    )
    monkeypatch.delenv("ALPHATPU_FORCE_INTERPRET")

    np.testing.assert_allclose(
        np.asarray(fused_pi), np.asarray(ref_pi), rtol=1e-6, atol=1e-7
    )
    for name in ("parent", "action_from", "expanded", "next_idx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fused_tree, name)),
            np.asarray(getattr(ref_tree, name)), err_msg=name,
        )
    for name in ("prior", "wsum", "visits"):
        np.testing.assert_allclose(
            np.asarray(getattr(fused_tree, name)),
            np.asarray(getattr(ref_tree, name)),
            rtol=1e-6, atol=1e-7, err_msg=name,
        )


def test_games_block_heuristic():
    """Lane-block width: widest of 1024/512/256/128 that fits VMEM and
    divides G; narrow boards cap at 1024, wide at 512."""
    from alphatpu.mcts.pallas_kernels import games_block

    assert games_block(7, 64, 8192) == 1024     # narrow: connect4
    assert games_block(9, 16, 1024) == 1024     # narrow: tictactoe
    assert games_block(7, 64, 512) == 512       # divisibility caps it
    assert games_block(49, 64, 8192) == 512     # wide: hex7 fits 512
    assert games_block(81, 64, 8192) == 256     # gobang9: 512 too big
    assert games_block(169, 64, 2048) == 128    # hex13: only 128 fits
    assert games_block(169, 64, 2048, itemsize=2) == 256  # bf16 halves it


def test_stat_dtype_for(monkeypatch):
    """bf16 storage is opt-in (measured slower on TPU: the gather loop is
    VPU-bound and bf16 loads add converts) and only engages when every
    stored quantity is exactly representable (integer visit counts <= 256)
    and the node count keeps the (16, 128) bf16 tile alignment."""
    assert stat_dtype_for(64) == jnp.float32  # default: f32 storage
    monkeypatch.setenv("ALPHATPU_BF16_STATS", "1")
    assert stat_dtype_for(64) == jnp.bfloat16
    assert stat_dtype_for(32) == jnp.bfloat16
    assert stat_dtype_for(256) == jnp.bfloat16
    assert stat_dtype_for(100) == jnp.float32  # not 16-row aligned
    assert stat_dtype_for(512) == jnp.float32  # counts exceed bf16 ints


@pytest.mark.parametrize("game_name,G,V", [
    ("tictactoe", 256, 32),
    ("hex5", 256, 32),
])
def test_packed_production_path_matches_twin(game_name, G, V, monkeypatch):
    """THE production configuration: the packed-plane fused kernel
    (select_apply_packed - one i32 (wsum_fix | visits) plane, peeled
    depth-0 walk, segmented vseg loop, aliased write-back) against its
    bit-exact jnp twin (packed_stats=True on a kernel-less backend =
    leaf values quantized to the 1/value_scale grid via backup's
    value_scale; all sums then exact).  Same rng key -> identical uniform
    streams; every tree field must match EXACTLY, and visits must still
    be exact integers."""
    game = make_game(game_name)
    params = init_params(
        jax.random.key(5), config_for_game(game, width=32, depth=2)
    )
    positions = broadcast_initial(game, G)
    tree0 = init_tree(game, positions, V)
    rng = jax.random.key(29)

    monkeypatch.setenv("ALPHATPU_NO_KERNELS", "1")
    ref_tree, ref_pi = run_mcts(
        game, apply_inference, params, tree0, rng,
        rollouts=V, cpuct=CPUCT, training=True, packed_stats=True,
    )
    monkeypatch.delenv("ALPHATPU_NO_KERNELS")
    monkeypatch.setenv("ALPHATPU_FORCE_INTERPRET", "1")
    k_tree, k_pi = run_mcts(
        game, apply_inference, params, tree0, rng,
        rollouts=V, cpuct=CPUCT, training=True,
    )
    monkeypatch.delenv("ALPHATPU_FORCE_INTERPRET")

    np.testing.assert_allclose(
        np.asarray(k_pi), np.asarray(ref_pi), rtol=1e-6, atol=1e-7
    )
    for name in ("parent", "action_from", "expanded", "next_idx",
                 "prior", "wsum", "visits"):
        np.testing.assert_array_equal(
            np.asarray(getattr(k_tree, name)),
            np.asarray(getattr(ref_tree, name)), err_msg=name,
        )
    np.testing.assert_array_equal(np.asarray(k_tree.visits) % 1.0, 0.0)
    # wsum is an exact sum of 1/value_scale(V)-grid values: scaling it
    # back up must give exact integers everywhere
    from alphatpu.mcts.pallas_kernels import value_scale
    np.testing.assert_array_equal(
        (np.asarray(k_tree.wsum, np.float64) * value_scale(V)) % 1.0, 0.0
    )


@pytest.mark.parametrize("game_name,G,V", [
    ("tictactoe", 256, 32),
    ("hex5", 256, 32),
])
def test_bf16_stats_kernel_matches_jnp(game_name, G, V, monkeypatch):
    """bf16 stat storage (opt-in measurement lever, measured ~16% slower
    than f32 - see tree.stat_dtype_for): the
    kernel path and the jnp twin run all math in f32 and round to bf16 at
    the identical write-back points (one rounding per edge add, one per
    prior-row write), so kernel-vs-jnp parity stays BIT-exact - not merely
    tolerance-close - in the compressed production configuration
    (segmented vseg loop, 16-row bf16 tiles, aliased write-back)."""
    game = make_game(game_name)
    params = init_params(
        jax.random.key(5), config_for_game(game, width=32, depth=2)
    )
    positions = broadcast_initial(game, G)
    tree0 = init_tree(game, positions, V, stat_dtype=jnp.bfloat16)
    rng = jax.random.key(23)

    monkeypatch.setenv("ALPHATPU_NO_KERNELS", "1")
    ref_tree, ref_pi = run_mcts(
        game, apply_inference, params, tree0, rng,
        rollouts=V, cpuct=CPUCT, training=True,
    )
    monkeypatch.delenv("ALPHATPU_NO_KERNELS")
    monkeypatch.setenv("ALPHATPU_FORCE_INTERPRET", "1")
    k_tree, k_pi = run_mcts(
        game, apply_inference, params, tree0, rng,
        rollouts=V, cpuct=CPUCT, training=True,
    )
    monkeypatch.delenv("ALPHATPU_FORCE_INTERPRET")

    np.testing.assert_allclose(
        np.asarray(k_pi), np.asarray(ref_pi), rtol=1e-6, atol=1e-7
    )
    for name in ("parent", "action_from", "expanded", "next_idx",
                 "prior", "wsum", "visits"):
        a = np.asarray(getattr(k_tree, name))
        b = np.asarray(getattr(ref_tree, name))
        assert a.dtype == b.dtype, name
        np.testing.assert_array_equal(a, b, err_msg=name)
    assert k_tree.wsum.dtype == jnp.bfloat16
    # visit counts are exact integers in bf16 up to 256
    np.testing.assert_array_equal(
        np.asarray(k_tree.visits, np.float32) % 1.0, 0.0
    )


@pytest.mark.parametrize("game_name,G,V", [
    ("tictactoe", 256, 32),
    ("hex5", 256, 32),
])
def test_segmented_production_path_matches_jnp(game_name, G, V, monkeypatch):
    """The PRODUCTION kernel configuration - probs=None, V % 32 == 0,
    rollouts == V, so run_mcts takes the segmented rollout loop calling
    select_apply_pallas with vseg-bounded blocks and relying on
    input/output aliasing to pass rows >= vseg through - against the jnp
    reference under the same rng key (probs=None draws the identical
    uniform stream in both paths, so results must match exactly up to
    kernel float tolerance)."""
    game = make_game(game_name)
    params = init_params(
        jax.random.key(5), config_for_game(game, width=32, depth=2)
    )
    positions = broadcast_initial(game, G)
    tree0 = init_tree(game, positions, V)
    rng = jax.random.key(19)

    monkeypatch.setenv("ALPHATPU_NO_KERNELS", "1")
    ref_tree, ref_pi = run_mcts(
        game, apply_inference, params, tree0, rng,
        rollouts=V, cpuct=CPUCT, training=True, packed_stats=False,
    )
    monkeypatch.delenv("ALPHATPU_NO_KERNELS")
    monkeypatch.setenv("ALPHATPU_FORCE_INTERPRET", "1")
    seg_tree, seg_pi = run_mcts(
        game, apply_inference, params, tree0, rng,
        rollouts=V, cpuct=CPUCT, training=True, packed_stats=False,
    )
    monkeypatch.delenv("ALPHATPU_FORCE_INTERPRET")

    np.testing.assert_allclose(
        np.asarray(seg_pi), np.asarray(ref_pi), rtol=1e-6, atol=1e-7
    )
    for name in ("parent", "action_from", "expanded", "next_idx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(seg_tree, name)),
            np.asarray(getattr(ref_tree, name)), err_msg=name,
        )
    for name in ("prior", "wsum", "visits"):
        np.testing.assert_allclose(
            np.asarray(getattr(seg_tree, name)),
            np.asarray(getattr(ref_tree, name)),
            rtol=1e-6, atol=1e-7, err_msg=name,
        )


def test_packed_stats_refuses_pregrown_tree():
    """packed_stats=True on a pre-grown tree (segment_rollouts=False, the
    caller's declaration of one) must raise: value_scale only bounds ONE
    search's per-edge (wsum * scale | visits) inside the u16 halves, so
    chained unreset searches would silently wrap (advisor r4, medium).
    The auto default (packed_stats=None) must instead quietly fall back
    to the unpacked path."""
    game = make_game("tictactoe")
    params = init_params(
        jax.random.key(0), config_for_game(game, width=32, depth=2)
    )
    positions = broadcast_initial(game, 8)
    tree0 = init_tree(game, positions, 8)
    with pytest.raises(ValueError, match="freshly reset"):
        run_mcts(game, apply_inference, params, tree0, jax.random.key(1),
                 rollouts=8, cpuct=CPUCT, training=True,
                 segment_rollouts=False, packed_stats=True)
    # auto: no error, runs unpacked
    tree1, pi = run_mcts(
        game, apply_inference, params, tree0, jax.random.key(1),
        rollouts=8, cpuct=CPUCT, training=True, segment_rollouts=False)
    assert np.isfinite(np.asarray(pi)).all()


@pytest.mark.parametrize("game_name,G,V", [
    ("tictactoe", 256, 32),
    ("hex5", 256, 32),
])
def test_packed1_path_matches_twin(game_name, G, V, monkeypatch):
    """The 1-plane representation (packed_stats=2: select_apply_packed1 -
    prior u11 | wsum fix | visits in ONE i32 word, peeled depth-0 walk,
    aliased write-back) against its bit-exact jnp twin (packed_stats=2 on
    a kernel-less backend = leaf values on the 1/scale grid AND prior rows
    on the 1/2048 grid).  Every tree field must match EXACTLY; visits must
    be exact integers; wsum and prior must sit exactly on their grids."""
    game = make_game(game_name)
    params = init_params(
        jax.random.key(5), config_for_game(game, width=32, depth=2)
    )
    positions = broadcast_initial(game, G)
    tree0 = init_tree(game, positions, V)
    rng = jax.random.key(29)

    monkeypatch.setenv("ALPHATPU_NO_KERNELS", "1")
    ref_tree, ref_pi = run_mcts(
        game, apply_inference, params, tree0, rng,
        rollouts=V, cpuct=CPUCT, training=True, packed_stats=2,
    )
    monkeypatch.delenv("ALPHATPU_NO_KERNELS")
    monkeypatch.setenv("ALPHATPU_FORCE_INTERPRET", "1")
    k_tree, k_pi = run_mcts(
        game, apply_inference, params, tree0, rng,
        rollouts=V, cpuct=CPUCT, training=True, packed_stats=2,
    )
    monkeypatch.delenv("ALPHATPU_FORCE_INTERPRET")

    np.testing.assert_allclose(
        np.asarray(k_pi), np.asarray(ref_pi), rtol=1e-6, atol=1e-7
    )
    for name in ("parent", "action_from", "expanded", "next_idx",
                 "prior", "wsum", "visits"):
        np.testing.assert_array_equal(
            np.asarray(getattr(k_tree, name)),
            np.asarray(getattr(ref_tree, name)), err_msg=name,
        )
    from alphatpu.mcts.pallas_kernels import packed1_layout

    bits_v, bits_w, s = packed1_layout(V)
    np.testing.assert_array_equal(np.asarray(k_tree.visits) % 1.0, 0.0)
    assert np.asarray(k_tree.visits).max() < (1 << bits_v)
    np.testing.assert_array_equal(
        (np.asarray(k_tree.wsum, np.float64) * s) % 1.0, 0.0)
    np.testing.assert_array_equal(
        (np.asarray(k_tree.prior, np.float64) * 2048) % 1.0, 0.0)


def test_packed1_vs_packed2_same_search_shape(monkeypatch):
    """Same key, level 1 vs level 2 on the kernel-less twin: the searches
    agree except where the coarser value/prior grids flip a CDF sample -
    visit totals (conservation) must agree exactly."""
    game = make_game("tictactoe")
    params = init_params(
        jax.random.key(0), config_for_game(game, width=32, depth=2)
    )
    positions = broadcast_initial(game, 64)
    tree0 = init_tree(game, positions, 16)
    monkeypatch.setenv("ALPHATPU_NO_KERNELS", "1")
    t1, _ = run_mcts(game, apply_inference, params, tree0,
                     jax.random.key(3), rollouts=16, cpuct=CPUCT,
                     training=True, packed_stats=1)
    t2, _ = run_mcts(game, apply_inference, params, tree0,
                     jax.random.key(3), rollouts=16, cpuct=CPUCT,
                     training=True, packed_stats=2)
    np.testing.assert_array_equal(
        np.asarray(t1.visits[:, 0, :].sum(0)),
        np.asarray(t2.visits[:, 0, :].sum(0)))
