"""Net-zoo variants satisfy the engine's (params, x) -> (logits, value)
contract (reference DenseNet.jl variant collection, SURVEY.md #17)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphatpu.games import make_game
from alphatpu.nets import config_for_game
from alphatpu.nets.zoo import ZOO, make_conv_net, make_net


@pytest.mark.parametrize("name", sorted(ZOO))
def test_zoo_contract(name):
    game = make_game("connect4")
    cfg = config_for_game(game, width=32, depth=2)
    params, apply = make_net(name, jax.random.key(0), cfg)
    x = jnp.zeros((5, cfg.in_dim)).at[:, ::3].set(1.0)
    logits, value = jax.jit(apply)(params, x)
    assert logits.shape == (5, cfg.actions)
    assert value.shape == (5,)
    assert np.isfinite(np.asarray(logits)).all()
    v = np.asarray(value)
    assert ((v >= 0) & (v <= 1)).all()


def test_conv_net_contract():
    game = make_game("connect4")
    init, apply = make_conv_net(game, channels=8, depth=2)
    params = init(jax.random.key(0))
    x = jnp.zeros((4, game.encoded_size)).at[:, 5].set(1.0)
    logits, value = jax.jit(apply)(params, x)
    assert logits.shape == (4, game.max_actions)
    assert value.shape == (4,)


def test_zoo_net_drives_search():
    """A zoo variant drops into run_mcts unchanged."""
    from alphatpu.mcts import init_tree, run_mcts
    from alphatpu.selfplay import broadcast_initial

    game = make_game("tictactoe")
    cfg = config_for_game(game, width=16, depth=1)
    params, apply = make_net("res2", jax.random.key(0), cfg)
    positions = broadcast_initial(game, 4)
    tree = init_tree(game, positions, 8)
    tree, pol = jax.jit(
        lambda t, k: run_mcts(game, apply, params, t, k,
                              rollouts=8, cpuct=1.5, training=True)
    )(tree, jax.random.key(1))
    pol = np.asarray(pol)
    assert pol.shape == (game.max_actions, 4)
    assert np.all(np.abs(pol.sum(0) - 1.0) < 0.05)
