"""Production CPU engine: numpy net forward parity with the jitted net,
and MctsContext sanity (legal, tactically sound moves)."""
import jax
import numpy as np

from alphatpu.cpu_mcts import MctsContext, numpy_net, oracle_for_game
from alphatpu.games import make_game
from alphatpu.nets import apply_inference, config_for_game, init_params


def test_numpy_net_matches_jit_forward():
    game = make_game("connect4")
    params = init_params(jax.random.key(3), config_for_game(game, width=64,
                                                            depth=3))
    oracle = oracle_for_game(game)
    rng = np.random.default_rng(0)
    st = oracle.initial()
    for a in [3, 2, 4, 2]:
        st = oracle.play(st, a)
    prior_fn, value_fn = numpy_net(params)
    p_np, v_np = prior_fn(st), value_fn(st)

    mover, other = oracle.planes(st)
    x = np.concatenate([mover, other])[None, :]
    logits, v = apply_inference(params, x)
    p_jit = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
    np.testing.assert_allclose(p_np, p_jit, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(v_np, float(v[0]), rtol=2e-5, atol=1e-6)


def test_mcts_context_plays_legal_and_blocks():
    """Even with random weights, 256 rollouts on TicTacToe must block an
    immediate loss (the search sees the terminal)."""
    game = make_game("tictactoe")
    params = init_params(jax.random.key(0), config_for_game(game, width=32,
                                                            depth=2))
    ctx = MctsContext(1.5, game, params, seed=1)
    oracle = oracle_for_game(game)
    st = oracle.initial()
    # X at 0 and 1 (column 0 cells r=0,1): threat at cell 2; O to move
    for a in [0, 4, 1]:
        st = oracle.play(st, a)
    pi, v = ctx(st, 256)
    assert pi.shape == (9,)
    assert abs(pi.sum() - 1.0) < 1e-4
    legal = set(oracle.legal_actions(st))
    assert int(np.argmax(pi)) in legal
    assert int(np.argmax(pi)) == 2, "search must block the column threat"
    assert 0.0 <= v <= 1.0
