"""Learner tests: loss decreases, optimizer matches the reference recipe,
duel/Elo math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphatpu.buffer import create_buffer, write_samples
from alphatpu.duel import DuelConfig, duel_network, elo_update
from alphatpu.games import make_game
from alphatpu.nets import (
    NetConfig,
    apply_inference,
    apply_training,
    config_for_game,
    init_params,
)
from alphatpu.train import TrainConfig, make_optimizer, train_epoch


def _filled_buffer(game, n, rng):
    buf = create_buffer(game, capacity=n)
    in_dim = 2 * game.vectorized_state
    st = rng.integers(0, 2, (n, in_dim)).astype(np.int8)
    pol = rng.random((n, game.max_actions), dtype=np.float32)
    pol /= pol.sum(-1, keepdims=True)
    ply = np.where(rng.random(n) < 0.5, 1, -1).astype(np.int8)
    val = rng.integers(0, 3, n).astype(np.float32) / 2.0
    fst = np.where(rng.random((n, game.feature_size)) < 0.5, 1, -1).astype(np.int8)
    return write_samples(
        buf, jnp.asarray(st), jnp.asarray(pol), jnp.asarray(ply),
        jnp.asarray(val), jnp.asarray(fst), jnp.ones(n, bool),
    )


def test_train_epoch_reduces_loss(rng):
    game = make_game("tictactoe")
    cfg = TrainConfig(batch_size=64, epochs=1)
    params = init_params(jax.random.key(0), config_for_game(game, width=64, depth=2))
    buf = _filled_buffer(game, 2048, rng)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)

    step = jax.jit(train_epoch, static_argnums=(4, 5))
    losses = []
    for e in range(6):
        params, opt_state, loss = step(
            params, opt_state, buf, jax.random.key(e), cfg, optimizer
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_optimizer_is_adam_plus_decoupled_wd():
    """One manual step vs the optax chain: update = -(lr*adamstep + wd*w)."""
    cfg = TrainConfig(lr=1e-3, weight_decay=1e-4)
    opt = make_optimizer(cfg)
    w = jnp.array([1.0, -2.0, 3.0])
    g = jnp.array([0.1, 0.2, -0.3])
    state = opt.init(w)
    upd, _ = opt.update(g, state, w)
    # step 1 adam: mhat = g, vhat = g^2 -> step = g/(|g|+eps) = sign(g)
    want = -(cfg.lr * g / (jnp.abs(g) + 1e-8) + cfg.weight_decay * w)
    np.testing.assert_allclose(np.asarray(upd), np.asarray(want), rtol=1e-4)


def test_net_shapes_and_heads():
    cfg = NetConfig(in_dim=18, actions=9, fsize=9, width=32, depth=3)
    params = init_params(jax.random.key(0), cfg)
    x = jnp.ones((5, 18))
    logits, v = apply_inference(params, x)
    assert logits.shape == (5, 9) and v.shape == (5,)
    assert 0.0 <= float(v.min()) and float(v.max()) <= 1.0
    logits2, v2, f = apply_training(params, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-6)
    assert f.shape == (5, 9)
    assert float(jnp.abs(f).max()) <= 1.0


def test_elo_update_math():
    # candidate scores 75% of 1024 games -> Elo gain ~ +191
    new = elo_update(768, 0, 256, 0.0)
    assert abs(new - 190.8) < 1.0
    # 50% -> unchanged
    assert abs(elo_update(512, 0, 512, 100.0) - 100.0) < 1e-9
    # shutout -> +400 cap path
    assert elo_update(10, 0, 0, 0.0) == 400.0


def test_duel_stronger_net_wins():
    """A net biased toward the center column beats a uniform net at
    Connect-4 over a small duel (probabilistic but wide margin)."""
    game = make_game("connect4")

    def biased(params, x):
        B = x.shape[0]
        logits = jnp.zeros((B, 7)).at[:, 3].set(params["bias"])
        return logits, jnp.full((B,), 0.5)

    strong = {"bias": jnp.float32(2.0)}
    weak = {"bias": jnp.float32(0.0)}
    cfg = DuelConfig(num_games=16, rollouts=12)
    w, d, l, u = duel_network(game, biased, strong, weak, jax.random.key(0), cfg)
    assert w + d + l + u == 16
    assert u == 0  # connect4 always terminates within the move bound
    assert w > l, (w, d, l)
