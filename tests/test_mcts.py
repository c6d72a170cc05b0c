"""Batched MCTS vs the scalar reference-semantics twin, plus unit tests for
the regularized-policy solve and CDF sampling."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphatpu import bitboard as bb
from alphatpu.games import make_game
from alphatpu.mcts import init_tree, run_mcts
from alphatpu.mcts.tree import child_lookup
from alphatpu.mcts.newton import cdf_sample, regularized_policy

from alphatpu import oracles
from alphatpu import cpu_mcts as scalar_mcts

F = np.float32


def scalar_reg_policy(prior, q, visits, cpuct):
    n = F(1.0 + visits.sum())
    a_cnt = F((prior > 0).sum())
    lam = F(cpuct * np.sqrt(n) / (a_cnt + n))
    alpha = scalar_mcts.newton_alpha(prior, q, lam)
    return (lam * prior / (alpha - q)).astype(F)


def test_regularized_policy_matches_scalar(rng):
    G, A = 32, 9
    prior = rng.random((G, A), dtype=np.float32)
    # knock out some actions, renormalize over the rest
    prior[rng.random((G, A)) < 0.4] = 0
    prior[:, 0] = np.maximum(prior[:, 0], 0.05)  # keep at least one legal
    prior /= prior.sum(-1, keepdims=True)
    q = (rng.random((G, A)) * 0.9).astype(np.float32)
    visits = rng.integers(0, 20, (G, A)).astype(np.float32)
    # search-consistent inputs: visits/q only where the prior is positive
    q[visits == 0] = 0.0
    q[prior == 0] = 0.0
    visits[prior == 0] = 0.0

    got = np.asarray(
        jax.jit(regularized_policy)(
            jnp.asarray(prior.T), jnp.asarray(q.T), jnp.asarray(visits.T), 1.5
        )
    ).T
    for g in range(G):
        want = scalar_reg_policy(prior[g], q[g], visits[g], 1.5)
        np.testing.assert_allclose(got[g], want, rtol=2e-3, atol=1e-5)
        # pi is near-normalized over positive entries and 0 elsewhere
        assert got[g][prior[g] == 0].max(initial=0) == 0
        assert abs(got[g].sum() - 1.0) < 0.05

    # adversarial (search-inconsistent) inputs: equivalence only
    q2 = (rng.random((G, A)) * 0.9).astype(np.float32)
    got2 = np.asarray(
        jax.jit(regularized_policy)(
            jnp.asarray(prior.T), jnp.asarray(q2.T), jnp.asarray(visits.T), 2.0
        )
    ).T
    for g in range(G):
        want = scalar_reg_policy(prior[g], q2[g], visits[g], 2.0)
        np.testing.assert_allclose(got2[g], want, rtol=2e-3, atol=1e-5)


def test_cdf_sample_matches_scalar(rng):
    G, A = 64, 7
    pi = rng.random((G, A), dtype=np.float32)
    pi[rng.random((G, A)) < 0.5] = 0
    pi[:, 3] = np.maximum(pi[:, 3], 0.01)
    pi /= pi.sum(-1, keepdims=True)
    prob = rng.random(G, dtype=np.float32)
    got = np.asarray(jax.jit(cdf_sample)(jnp.asarray(pi.T), jnp.asarray(prob)))
    for g in range(G):
        assert got[g] == scalar_mcts.cdf_pick(pi[g], prob[g]), g
        assert pi[g, got[g]] > 0


# ---- full-search equivalence on the same uniform stream ----


def words_from_plane(spec, plane):
    return bb.from_planes(spec, jnp.asarray(np.asarray(plane)))


def pos_from_oracle(game, ost):
    """Convert a numpy-oracle state into the game's jnp Position."""
    mover_p, other_p = (
        ost["mover"].T.reshape(-1).astype(np.int32),
        ost["other"].T.reshape(-1).astype(np.int32),
    )
    spec = game.spec
    bp = words_from_plane(spec, mover_p)
    bo = words_from_plane(spec, other_p)
    player = jnp.int8(ost["player"])
    name = game.name
    if name.startswith("reversi"):
        from alphatpu.games.reversi import ReversiState

        return ReversiState(bp, bo, game.legal_board(bp, bo), player)
    if name.startswith("hex"):
        from alphatpu.games.hex import HexState

        return HexState(bp, bo, player, jnp.int32(0))
    if name == "connect4":
        from alphatpu.games.connect4 import Connect4State

        return Connect4State(bp, bo, player, jnp.int32(0))
    from alphatpu.games.gobang import GobangState

    return GobangState(bp, bo, player, jnp.int32(0))


def uniform_net(actions):
    def apply(params, x):
        B = x.shape[0]
        return jnp.zeros((B, actions)), jnp.full((B,), 0.5)

    return apply


@pytest.mark.parametrize(
    "name,oracle_cls,training",
    [
        ("tictactoe", lambda: oracles.OracleGobang(3, 3), True),
        ("connect4", oracles.OracleConnect4, True),
        ("connect4", oracles.OracleConnect4, False),
        ("reversi6x6", lambda: oracles.OracleReversi(6), True),
        ("hex5", lambda: oracles.OracleHex(5), True),
    ],
)
def test_search_matches_scalar_twin(name, oracle_cls, training, rng):
    game = make_game(name)
    oracle = oracle_cls()
    G, R, cpuct = 6, 24, 1.5
    D = min(game.max_game_length, R)

    # diverse roots: play 0..7 random opening plies per game
    roots_np = []
    for g in range(G):
        ost = oracle.initial()
        for _ in range(int(rng.integers(0, 8))):
            acts = oracle.legal_actions(ost)
            nxt = oracle.play(ost, int(acts[rng.integers(len(acts))]))
            if oracle.is_over(nxt)[0]:
                break
            ost = nxt
        roots_np.append(ost)
    positions = jax.tree.map(
        lambda *leaves: jnp.stack(leaves),
        *[pos_from_oracle(game, o) for o in roots_np],
    )

    probs = rng.random((R, D, G), dtype=np.float32)
    net = uniform_net(game.max_actions)

    tree0 = init_tree(game, positions, R)

    @jax.jit
    def run(tree, probs):
        return run_mcts(
            game, net, None, tree, jax.random.key(0),
            rollouts=R, cpuct=cpuct, training=training, probs=probs,
        )

    tree, root_pi = run(tree0, jnp.asarray(probs))
    tree = jax.device_get(tree)
    root_pi = np.asarray(root_pi)

    A = game.max_actions
    uni = np.full(A, np.float32(1.0) / np.float32(A))
    twin = scalar_mcts.ScalarMCTS(
        oracle, A, cpuct, training,
        prior_fn=lambda s: uni, value_fn=lambda s: F(0.5),
    )
    for g in range(G):
        nodes, pol = twin.search(roots_np[g], probs[:, :, g])
        assert int(tree.next_idx[g]) == len(nodes), f"game {g} node count"
        for i, node in enumerate(nodes):
            assert int(tree.parent[i, g]) == node.parent, (g, i)
            if i > 0:
                assert int(tree.action_from[i, g]) == node.action_from, (g, i)
            assert bool(tree.expanded[i, g]) == node.expanded, (g, i)
            np.testing.assert_array_equal(
                tree.visits[:, i, g], node.visits, err_msg=f"visits {g} {i}"
            )
            np.testing.assert_allclose(
                tree.q[:, i, g], node.q, rtol=2e-3, atol=1e-5,
                err_msg=f"q {g} {i}",
            )
            for a, c in node.child.items():
                cid = child_lookup(
                    tree.parent, tree.action_from,
                    jnp.full((tree.num_games,), i, jnp.int32),
                    jnp.full((tree.num_games,), a, jnp.int32),
                )
                assert int(cid[g]) == c, (g, i, a)
        np.testing.assert_allclose(
            root_pi[:, g], pol, rtol=5e-3, atol=1e-5, err_msg=f"policy {g}"
        )


def test_single_rollout_returns_root_prior():
    """With rollouts == 1 the root is expanded during the only rollout; the
    returned policy must be the freshly written (noise-mixed) root prior,
    like the reference's prior->policy copy (mcts_gpu.jl:297-299) - not the
    zero init (regression)."""
    game = make_game("tictactoe")
    G = 4
    positions = jax.tree.map(
        lambda *l: jnp.stack(l), *[game.initial() for _ in range(G)]
    )
    tree0 = init_tree(game, positions, 1)
    net = uniform_net(game.max_actions)

    tree, root_pi = jax.jit(
        lambda t: run_mcts(game, net, None, t, jax.random.key(0),
                           rollouts=1, cpuct=1.5, training=True)
    )(tree0)
    root_pi = np.asarray(root_pi)
    np.testing.assert_allclose(root_pi.sum(0), np.ones(G), rtol=1e-5)
    # uniform net + training root mix: 0.75/9 + 0.25/9 = uniform over legal
    np.testing.assert_allclose(root_pi, np.full((9, G), 1.0 / 9), rtol=1e-5)


def test_visit_conservation_with_real_net(rng):
    """With a real random net: total root child visits == rollouts - 1
    (every rollout after the root expansion passes through the root)."""
    from alphatpu.nets import apply_inference, config_for_game, init_params

    game = make_game("tictactoe")
    G, R = 8, 32
    params = init_params(jax.random.key(1), config_for_game(game))
    positions = jax.tree.map(
        lambda *l: jnp.stack(l), *[game.initial() for _ in range(G)]
    )
    tree0 = init_tree(game, positions, R)

    @jax.jit
    def run(tree, key):
        return run_mcts(
            game, apply_inference, params, tree, key,
            rollouts=R, cpuct=1.5, training=True,
        )

    tree, root_pi = run(tree0, jax.random.key(2))
    visits = np.asarray(tree.visits[:, 0]).T  # [G, A]
    np.testing.assert_array_equal(visits.sum(-1), np.full(G, R - 1))
    # every visited root action is legal
    legal = np.asarray(jax.vmap(game.legal_mask)(positions))
    assert not np.any((visits > 0) & ~legal)
    # q values live in [0, 1]
    q = np.asarray(tree.q)
    assert q.min() >= 0.0 and q.max() <= 1.0
    # policies are near-distributions
    assert np.all(np.abs(np.asarray(root_pi).sum(0) - 1.0) < 0.05)
