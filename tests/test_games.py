"""Trajectory equivalence: jnp games vs independent numpy oracles.

Both implementations step through the same random games; at every ply the
legal mask, encoded planes, terminal flag and result must agree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphatpu.games import make_game

from alphatpu import oracles


def _pair(name):
    g = make_game(name)
    if name == "tictactoe":
        o = oracles.OracleGobang(3, 3)
    elif name == "gobang5":
        o = oracles.OracleGobang(5, 4)
    elif name == "connect4":
        o = oracles.OracleConnect4()
    elif name == "hex5":
        o = oracles.OracleHex(5)
    elif name == "reversi6x6":
        o = oracles.OracleReversi(6)
    elif name == "reversi8x8":
        o = oracles.OracleReversi(8)
    else:
        raise ValueError(name)
    return g, o


def _jit_step(game):
    @jax.jit
    def step(pos, action):
        new = game.play(pos, action)
        done, result = game.is_over(new)
        return new, game.legal_mask(new), done, result, game.encode(new)

    @jax.jit
    def inspect(pos):
        done, result = game.is_over(pos)
        return game.legal_mask(pos), done, result, game.encode(pos)

    return step, inspect


GAMES = ["tictactoe", "gobang5", "connect4", "hex5", "reversi6x6", "reversi8x8"]


@pytest.mark.parametrize("name", GAMES)
def test_random_trajectories_match_oracle(name, rng):
    game, oracle = _pair(name)
    if name == "gobang5":
        game.nvict = 4  # align with oracle (make_game default is n for n<8)
        game = type(game)(5, 4)
    step, inspect = _jit_step(game)
    n_games = 3 if name == "reversi8x8" else 4

    for gi in range(n_games):
        pos = game.initial()
        ost = oracle.initial()
        legal, done, result, enc = inspect(pos)
        t = 0
        while True:
            o_legal = oracle.legal_actions(ost)
            # legal masks agree
            got = np.flatnonzero(np.asarray(legal)).tolist()
            assert got == o_legal, f"{name} game {gi} ply {t}: legal {got} vs {o_legal}"
            # planes agree
            mover_p, other_p = oracle.planes(ost)
            enc_np = np.asarray(enc)
            vs = game.vectorized_state
            np.testing.assert_array_equal(enc_np[:vs], mover_p, err_msg=f"{name} ply {t} mover")
            np.testing.assert_array_equal(enc_np[vs:], other_p, err_msg=f"{name} ply {t} other")

            a = int(o_legal[rng.integers(len(o_legal))])
            pos, legal, done, result, enc = step(pos, jnp.int32(a))
            ost = oracle.play(ost, a)
            o_done, o_result = oracle.is_over(ost)
            assert bool(done) == bool(o_done), f"{name} game {gi} ply {t} done"
            if o_done:
                assert int(result) == int(o_result), (
                    f"{name} game {gi} ply {t}: result {int(result)} vs {o_result}"
                )
                break
            t += 1
            assert t < 200, "runaway game"


@pytest.mark.parametrize("name", GAMES)
def test_final_feature_and_batching(name, rng):
    game, oracle = _pair(name)
    if name == "gobang5":
        game = type(game)(5, 4)
    # play a few random moves, then check final_feature and vmap consistency
    pos = game.initial()
    ost = oracle.initial()
    for _ in range(4):
        acts = oracle.legal_actions(ost)
        a = int(acts[rng.integers(len(acts))])
        pos = game.play(pos, jnp.int32(a))
        ost = oracle.play(ost, a)
    ff = np.asarray(jax.jit(game.final_feature)(pos))
    mover_p, _ = oracle.planes(ost)
    player = ost["player"]
    want = np.where(mover_p != 0, player, -player).astype(np.int8)
    np.testing.assert_array_equal(ff, want)

    # vmapped step over a batch of identical states equals the single step
    batch = jax.tree.map(lambda x: jnp.stack([x] * 5), pos)
    acts = oracle.legal_actions(ost)
    a = jnp.full((5,), acts[0], jnp.int32)
    out = jax.jit(jax.vmap(game.play))(batch, a)
    single = game.play(pos, jnp.int32(acts[0]))
    for bleaf, sleaf in zip(jax.tree.leaves(out), jax.tree.leaves(single)):
        np.testing.assert_array_equal(np.asarray(bleaf[0]), np.asarray(sleaf))
