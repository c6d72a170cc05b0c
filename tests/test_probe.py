"""Probe-engine tests: rule agreement with the numpy oracles, known-value
positions, strength over random, and the eval_vs_probe driver."""
import numpy as np
import jax

from alphatpu.games import make_game
from alphatpu.probe import (
    GomokuProbe,
    LineProbe,
    ReversiProbe,
    eval_vs_probe,
    probe_for_game,
)

from alphatpu.oracles import OracleConnect4, OracleGobang, OracleReversi


def planes_of(oracle, st):
    return oracle.planes(st)


def random_playout_check(oracle, probe, steps, rng, line_game=True):
    """Walk a random game; at every state check the probe's move is legal
    per the oracle and its win/terminal detection agrees."""
    st = oracle.initial()
    for _ in range(steps):
        over, _ = oracle.is_over(st)
        if over:
            break
        mover, other = planes_of(oracle, st)
        a = probe.best_action(mover > 0, other > 0, rng)
        legal = oracle.legal_actions(st)
        assert a in legal, (a, legal)
        # win detection agreement on the mover's board
        if line_game:
            me, op = probe.from_planes(mover > 0, other > 0)
            from alphatpu.oracles import _line_exists
            assert probe.wins(op) == _line_exists(st["other"], oracle.nvict)
        # step randomly (not by probe) to cover diverse states
        st = oracle.play(st, legal[rng.integers(len(legal))])


def test_ttt_probe_is_perfect():
    """Full-depth 3x3 probe: self-play always draws, and it never loses
    to any opponent - check vs 200 random-mover games."""
    probe = LineProbe(3, 3, 3, depth=9)
    oracle = OracleGobang(3, 3)
    rng = np.random.default_rng(0)
    for g in range(40):
        st = oracle.initial()
        probe_is_first = g % 2 == 0
        for t in range(9):
            over, res = oracle.is_over(st)
            if over:
                break
            mover, other = planes_of(oracle, st)
            if (t % 2 == 0) == probe_is_first:
                a = probe.best_action(mover > 0, other > 0, rng)
            else:
                legal = oracle.legal_actions(st)
                a = legal[rng.integers(len(legal))]
            st = oracle.play(st, a)
        over, res = oracle.is_over(st)
        assert over
        probe_sign = 1 if probe_is_first else -1
        assert res * probe_sign >= 0, "perfect TTT probe lost a game"


def test_ttt_probe_selfplay_draws():
    probe = LineProbe(3, 3, 3, depth=9)
    oracle = OracleGobang(3, 3)
    rng = np.random.default_rng(1)
    st = oracle.initial()
    for _ in range(9):
        over, res = oracle.is_over(st)
        if over:
            break
        mover, other = planes_of(oracle, st)
        st = oracle.play(st, probe.best_action(mover > 0, other > 0, rng))
    over, res = oracle.is_over(st)
    assert over and res == 0


def test_connect4_probe_legal_and_tactics():
    oracle = OracleConnect4()
    probe = LineProbe(6, 7, 4, depth=4, gravity=True)
    rng = np.random.default_rng(2)
    for _ in range(5):
        random_playout_check(oracle, probe, 42, rng)
    # tactical check: wins on the spot / blocks an immediate threat
    st = oracle.initial()
    for a in [3, 2, 3, 2, 3]:  # first mover has 3 in column 3; block or lose
        st = oracle.play(st, a)
    mover, other = planes_of(oracle, st)
    a = probe.best_action(mover > 0, other > 0, rng)
    assert a == 3, "probe must block the vertical 4-threat"


def test_connect4_probe_beats_random():
    oracle = OracleConnect4()
    probe = LineProbe(6, 7, 4, depth=4, gravity=True)
    rng = np.random.default_rng(3)
    score = 0
    for g in range(10):
        st = oracle.initial()
        probe_first = g % 2 == 0
        for t in range(42):
            over, res = oracle.is_over(st)
            if over:
                break
            mover, other = planes_of(oracle, st)
            if (t % 2 == 0) == probe_first:
                a = probe.best_action(mover > 0, other > 0, rng)
            else:
                legal = oracle.legal_actions(st)
                a = legal[rng.integers(len(legal))]
            st = oracle.play(st, a)
        over, res = oracle.is_over(st)
        score += res * (1 if probe_first else -1)
    assert score >= 8, f"depth-4 probe should crush random (score {score})"


def test_reversi_probe_rules_agree_with_oracle():
    oracle = OracleReversi(6)
    probe = ReversiProbe(6, depth=2)
    rng = np.random.default_rng(4)
    for _ in range(3):
        st = oracle.initial()
        for _ in range(50):
            over, _ = oracle.is_over(st)
            if over:
                break
            mover, other = planes_of(oracle, st)
            me, op = probe.from_planes(mover > 0, other > 0)
            legal_probe = probe.legal(me, op)
            acts = sorted(a for a in range(36) if (legal_probe >> a) & 1) \
                or [36]
            assert acts == oracle.legal_actions(st)
            a = acts[rng.integers(len(acts))]
            # flip agreement
            nop, nme = probe.play(me, op, a)
            st = oracle.play(st, a)
            m2, o2 = planes_of(oracle, st)
            me2, op2 = probe.from_planes(m2 > 0, o2 > 0)
            assert (nop, nme) == (me2, op2)


def test_reversi_probe_beats_random():
    oracle = OracleReversi(6)
    probe = ReversiProbe(6, depth=3, exact_empties=8)
    rng = np.random.default_rng(5)
    score = 0
    for g in range(6):
        st = oracle.initial()
        probe_first = g % 2 == 0
        for t in range(60):
            over, res = oracle.is_over(st)
            if over:
                break
            mover, other = planes_of(oracle, st)
            if (t % 2 == 0) == probe_first:
                a = probe.best_action(mover > 0, other > 0, rng)
            else:
                legal = oracle.legal_actions(st)
                a = legal[rng.integers(len(legal))]
            st = oracle.play(st, a)
        over, res = oracle.is_over(st)
        assert over
        score += res * (1 if probe_first else -1)
    assert score >= 5, f"reversi probe should crush random (score {score})"


def test_eval_vs_probe_driver():
    """Smoke the batched driver on TicTacToe with an untrained net: counts
    must sum to num_games, and the perfect probe must never lose."""
    from alphatpu.nets import apply_inference, config_for_game, init_params

    game = make_game("tictactoe")
    params = init_params(jax.random.key(0), config_for_game(game))
    w, d, l = eval_vs_probe(
        game, apply_inference, params, jax.random.key(1),
        probe_for_game(game), num_games=8, rollouts=8, temp_moves=2)
    assert w + d + l == 8
    assert w == 0, "an untrained net cannot beat the perfect TTT probe"


def test_probe_for_game_mapping():
    assert probe_for_game(make_game("tictactoe")).depth == 9
    assert probe_for_game(make_game("connect4")).gravity
    assert probe_for_game(make_game("reversi6x6")).size == 6
    g8 = probe_for_game(make_game("gobang8"))
    assert (g8.rows, g8.nvict) == (8, 5)
    assert isinstance(g8, GomokuProbe) and g8.depth == 5


def test_gomoku_probe_tactics_and_rules():
    oracle = OracleGobang(9, 5)
    probe = GomokuProbe(9, 9, 5, depth=3)
    rng = np.random.default_rng(4)
    # rule agreement along random playouts
    for _ in range(3):
        random_playout_check(oracle, probe, 30, rng)
    # empty board: restricted candidates = the center opening
    empty = np.zeros(81, bool)
    assert probe.best_action(empty, empty, rng) == probe.center == 40
    # forced moves: completes its own five; blocks the opponent's four
    me = np.zeros(81, bool)
    op = np.zeros(81, bool)
    for i in range(4):  # my four in row 4, cols 1..4 (cell = r + 9*c)
        me[4 + 9 * (1 + i)] = True
    op[[0, 1, 2]] = True
    a = probe.best_action(me, op, rng)
    assert a in (4 + 9 * 0, 4 + 9 * 5), "must complete the five"
    a = probe.best_action(op, me, rng)
    assert a in (4 + 9 * 0, 4 + 9 * 5), "must block the open four"


def test_gomoku_probe_beats_old_lineprobe():
    """The r3 verdict's ask: a stronger Gobang opponent.  Head-to-head at
    the SHIPPED depth (5), the threat-aware selective GomokuProbe must
    clearly beat the full-width depth-3 LineProbe that gobang9 was
    previously probed against (measured 6W/0D/0L; asserted with margin).
    At equal depth 3 the two split 3W/3L - the strength comes from the
    depth the selective search affords, which is the point."""
    oracle = OracleGobang(9, 5)
    new = GomokuProbe(9, 9, 5, depth=5)
    old = LineProbe(9, 9, 5, depth=3)
    rng = np.random.default_rng(5)
    score = 0
    for g in range(6):
        st = oracle.initial()
        new_first = g % 2 == 0
        for t in range(81):
            over, res = oracle.is_over(st)
            if over:
                break
            mover, other = planes_of(oracle, st)
            p = new if (t % 2 == 0) == new_first else old
            st = oracle.play(st, p.best_action(mover > 0, other > 0, rng))
        over, res = oracle.is_over(st)
        score += res * (1 if new_first else -1)
    assert score >= 4, f"GomokuProbe should beat old LineProbe (net {score})"


def test_hex_probe_tactics_and_geometry():
    """HexProbe: immediate-win detection, potential function values, and
    plane decoding against the framework game's embedded layout."""
    from alphatpu.probe import HexProbe

    n, m = 5, 6
    p = HexProbe(n)
    rng = np.random.default_rng(0)

    # empty-board potentials: each side needs n cells
    empty = np.zeros((1, n, n), bool)
    assert p._potential(empty, empty, 0)[0] == n
    assert p._potential(empty, empty, 1)[0] == n

    # x-connector one cell from winning takes it (chain x=0..3 at y=2)
    mover = np.zeros(m * m, bool)
    other = np.zeros(m * m, bool)
    mover[2:m] = True  # col-0 border
    for c in range(2, m):
        other[m * c] = True  # row-0 border
    for x in range(4):
        mover[(2 + 1) + m * (x + 1)] = True
    me, op, ax = p.from_planes(mover, other)
    assert ax == 0 and me.sum() == 4 and op.sum() == 0
    assert p._potential(me[None], op[None], 0)[0] == 1
    assert p.best_action(mover, other, rng) == 4 * n + 2

    # geometry cross-check vs the real game: encode after scripted moves
    game = make_game("hex5")
    pos = game.initial()
    moves = [12, 7, 13]  # first mover takes 12, 13; second takes 7
    for a in moves:
        pos = jax.tree.map(lambda x: x, game.play(pos, a))
    enc = np.asarray(jax.jit(game.encode)(pos))
    V = game.vectorized_state
    me2, op2, ax2 = p.from_planes(enc[:V] > 0, enc[V:] > 0)
    # after 3 plies the second mover is to move: owns row-0 border (y axis)
    assert ax2 == 1
    assert me2[7 // n, 7 % n] and op2[12 // n, 12 % n] and op2[13 // n, 13 % n]
    assert me2.sum() == 1 and op2.sum() == 2


def test_hex_probe_beats_random():
    """Depth-2 HexProbe vs uniform random on the real hex5 game, both
    colors; random should essentially never connect first."""
    from alphatpu.probe import HexProbe

    game = make_game("hex5")
    p = HexProbe(5)
    rng = np.random.default_rng(3)
    play = jax.jit(game.play)
    is_over = jax.jit(game.is_over)
    encode = jax.jit(game.encode)
    legal = jax.jit(game.legal_mask)
    V = game.vectorized_state

    score = 0
    for g in range(4):
        pos = game.initial()
        probe_first = g % 2 == 0
        for t in range(game.max_game_length):
            over, res = (np.asarray(x) for x in is_over(pos))
            if over:
                break
            if (t % 2 == 0) == probe_first:
                enc = np.asarray(encode(pos))
                a = p.best_action(enc[:V] > 0, enc[V:] > 0, rng)
            else:
                lm = np.asarray(legal(pos))
                a = int(rng.choice(np.flatnonzero(lm)))
            pos = play(pos, int(a))
        over, res = (np.asarray(x) for x in is_over(pos))
        assert over  # hex cannot draw
        score += int(res) * (1 if probe_first else -1)
    assert score == 4, f"hex probe should always beat random (score {score})"


def test_hex_probe_for_game():
    from alphatpu.probe import HexProbe

    hp = probe_for_game(make_game("hex7"))
    assert isinstance(hp, HexProbe) and hp.n == 7 and hp.depth == 2
