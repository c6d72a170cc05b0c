"""Selfplay generation + buffer protocol invariants on TicTacToe."""
import jax
import jax.numpy as jnp
import numpy as np

from alphatpu.buffer import buffer_size, create_buffer, write_samples
from alphatpu.games import make_game
from alphatpu.nets import apply_inference, config_for_game, init_params
from alphatpu.selfplay import SelfplayConfig, selfplay_generation


def test_buffer_ring_semantics(rng):
    game = make_game("tictactoe")
    buf = create_buffer(game, capacity=10)
    N = 7
    st = rng.integers(0, 2, (N, 18)).astype(np.int8)
    pol = rng.random((N, 9), dtype=np.float32)
    ply = np.ones(N, np.int8)
    val = rng.random(N, dtype=np.float32)
    fst = rng.integers(-1, 2, (N, 9)).astype(np.int8)
    mask = np.array([1, 0, 1, 1, 0, 1, 1], bool)

    buf = write_samples(
        buf, jnp.asarray(st), jnp.asarray(pol), jnp.asarray(ply),
        jnp.asarray(val), jnp.asarray(fst), jnp.asarray(mask),
    )
    assert int(buf.total[0]) == 5 and int(buf.cursor[0]) == 5
    kept = np.flatnonzero(mask)
    np.testing.assert_array_equal(np.asarray(buf.state[:5]), st[kept])
    np.testing.assert_array_equal(np.asarray(buf.policy[:5]), pol[kept])

    # wraparound: write 8 more valid rows into capacity-10 ring
    buf = write_samples(
        buf, jnp.asarray(st), jnp.asarray(pol), jnp.asarray(ply),
        jnp.asarray(val), jnp.asarray(fst), jnp.ones(N, bool),
    )
    # second write of 7 rows lands at slots 5..9, 0,1
    assert int(buf.total[0]) == 12 and int(buf.cursor[0]) == 2
    assert int(buffer_size(buf)) == 10
    np.testing.assert_array_equal(np.asarray(buf.state[0]), st[5])
    np.testing.assert_array_equal(np.asarray(buf.state[9]), st[4])


def test_selfplay_generation_invariants():
    game = make_game("tictactoe")
    params = init_params(jax.random.key(0), config_for_game(game, width=32, depth=2))
    cfg = SelfplayConfig(num_games=16, rollouts=16, cpuct=1.5)
    buf = create_buffer(game, capacity=512)

    buf, stats = jax.jit(selfplay_generation, static_argnums=(0, 1, 5))(
        game, apply_inference, params, buf, jax.random.key(1), cfg
    )
    stats = {k: np.asarray(v) for k, v in stats.items()}

    assert stats["illegal_moves"] == 0
    assert stats["unfinished"] == 0
    total = stats["wins"] + stats["draws"] + stats["losses"]
    assert total == 16
    # mean length: TTT games last 5..9 plies => recorded 0-based end index 4..8
    assert 4 <= stats["mean_length"] <= 8

    n = int(buffer_size(buf))
    assert n == int(stats["samples_written"])
    # each game contributes (fin_t + 1) samples
    assert 5 * 16 <= n <= 9 * 16

    state = np.asarray(buf.state[:n])
    policy = np.asarray(buf.policy[:n])
    player = np.asarray(buf.player[:n])
    value = np.asarray(buf.value[:n])
    fstate = np.asarray(buf.fstate[:n])

    # policies are near-distributions supported on empty cells of the state
    assert np.all(np.abs(policy.sum(-1) - 1.0) < 0.05)
    occupied = (state[:, :9] + state[:, 9:]) > 0
    assert not np.any((policy > 1e-6) & occupied)
    # player alternates +1/-1 and matches plane parity
    stones = state.sum(-1)
    np.testing.assert_array_equal(player, np.where(stones % 2 == 0, 1, -1))
    # value in {0, 0.5, 1} and consistent with (1 + r * player) / 2
    assert set(np.unique(value)).issubset({0.0, 0.5, 1.0})
    # fstate entries are +-1 everywhere (reference decode: +-player per cell)
    assert set(np.unique(fstate)).issubset({-1, 1})

    # per-game consistency: the first sample of each game is the empty board
    empties = np.flatnonzero(stones == 0)
    assert len(empties) == 16
    # within a round, value derives from one shared result per game:
    # reconstruct game segments by walking rounds: round-major write order
    # means samples of round t for all alive games are contiguous.


def test_selfplay_continuous_invariants():
    """Lane recycling: episodes back-fill correctly across recycled lanes."""
    game = make_game("tictactoe")
    params = init_params(jax.random.key(0), config_for_game(game, width=32, depth=2))
    T = 24  # enough rounds that every lane completes >= 2 episodes
    cfg = SelfplayConfig(num_games=8, rollouts=16, cpuct=1.5,
                         continuous=True, rounds=T)
    buf = create_buffer(game, capacity=512)

    from alphatpu.selfplay import selfplay_continuous

    buf, stats, carry = jax.jit(selfplay_continuous, static_argnums=(0, 1, 5))(
        game, apply_inference, params, buf, jax.random.key(1), cfg
    )
    stats = {k: np.asarray(v) for k, v in stats.items()}

    assert stats["illegal_moves"] == 0
    total = stats["wins"] + stats["draws"] + stats["losses"]
    assert total == stats["games_finished"]
    # 8 lanes x 24 rounds, TTT episodes last 5..9 plies -> >= 2 per lane
    assert stats["games_finished"] >= 16
    assert 4 <= stats["mean_length"] <= 8
    # every round of every lane produced a sample; tail episodes are carried
    assert stats["unfinished"] == 0  # nothing is dropped anymore
    assert stats["samples_written"] + stats["carried"] == T * 8
    assert stats["carried"] < 9 * 8  # at most one running episode per lane
    np.testing.assert_array_equal(np.asarray(carry.count).sum(),
                                  stats["carried"])

    n = int(buffer_size(buf))
    assert n == int(stats["samples_written"])
    state = np.asarray(buf.state[:n])
    policy = np.asarray(buf.policy[:n])
    player = np.asarray(buf.player[:n])
    value = np.asarray(buf.value[:n])
    fstate = np.asarray(buf.fstate[:n])

    # same per-sample invariants as one-shot generation
    assert np.all(np.abs(policy.sum(-1) - 1.0) < 0.05)
    occupied = (state[:, :9] + state[:, 9:]) > 0
    assert not np.any((policy > 1e-6) & occupied)
    stones = state.sum(-1)
    np.testing.assert_array_equal(player, np.where(stones % 2 == 0, 1, -1))
    assert set(np.unique(value)).issubset({0.0, 0.5, 1.0})
    assert set(np.unique(fstate)).issubset({-1, 1})
    # lanes recycle: multiple empty-board samples per lane
    assert (stones == 0).sum() >= 16


def test_selfplay_reversi_pass_games():
    """Reversi 6x6 selfplay completes with pass handling and no illegal moves."""
    game = make_game("reversi6x6")
    params = init_params(jax.random.key(0), config_for_game(game, width=32, depth=2))
    cfg = SelfplayConfig(num_games=8, rollouts=12, cpuct=1.5)
    buf = create_buffer(game, capacity=2048)
    buf, stats = jax.jit(selfplay_generation, static_argnums=(0, 1, 5))(
        game, apply_inference, params, buf, jax.random.key(3), cfg
    )
    stats = {k: int(np.asarray(v)) for k, v in stats.items()}
    assert stats["illegal_moves"] == 0
    assert stats["wins"] + stats["draws"] + stats["losses"] + stats["unfinished"] == 8
    assert stats["unfinished"] <= 1  # pass-chain truncation is rare


def test_episode_carry_chained_equals_single():
    """Persisting in-flight episodes across generations loses nothing: two
    chained 12-round generations (threading the EpisodeCarry, whose rng
    continues the stream) write the exact same sample multiset as one
    24-round generation, and drop zero rows."""
    from alphatpu.selfplay import make_carry, selfplay_continuous

    game = make_game("tictactoe")
    params = init_params(
        jax.random.key(0), config_for_game(game, width=32, depth=2)
    )
    G = 8
    run = jax.jit(selfplay_continuous, static_argnums=(0, 1, 5))

    def play(rounds_list):
        buf = create_buffer(game, capacity=512)
        carry = make_carry(game, G, jax.random.key(7))
        tot = {"samples_written": 0, "games_finished": 0}
        for T in rounds_list:
            cfg = SelfplayConfig(num_games=G, rollouts=16, cpuct=1.5,
                                 continuous=True, rounds=T)
            buf, stats, carry = run(
                game, apply_inference, params, buf, jax.random.key(99), cfg,
                carry,
            )
            assert int(stats["unfinished"]) == 0
            for k in tot:
                tot[k] += int(stats[k])
        return buf, carry, tot

    buf1, carry1, tot1 = play([24])
    buf2, carry2, tot2 = play([12, 12])

    assert tot1 == tot2
    n1, n2 = int(buffer_size(buf1)), int(buffer_size(buf2))
    assert n1 == n2 == tot1["samples_written"]

    def rows(buf, n):
        m = np.concatenate(
            [np.asarray(buf.state[:n], np.float32),
             np.asarray(buf.policy[:n]),
             np.asarray(buf.player[:n], np.float32)[:, None],
             np.asarray(buf.value[:n])[:, None],
             np.asarray(buf.fstate[:n], np.float32)],
            axis=1,
        )
        return m[np.lexsort(m.T)]

    # write ORDER differs at the boundary (carried rows flush later), the
    # sample multiset must be bit-identical
    np.testing.assert_array_equal(rows(buf1, n1), rows(buf2, n2))
    # and both schedules end in the same in-flight state
    np.testing.assert_array_equal(np.asarray(carry1.count),
                                  np.asarray(carry2.count))
    for a, b in zip(jax.tree.leaves(carry1.positions),
                    jax.tree.leaves(carry2.positions)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
