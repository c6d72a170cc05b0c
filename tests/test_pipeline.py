"""End-to-end pipeline smoke test and checkpoint roundtrip."""
import os

import jax
import numpy as np

from alphatpu import checkpoint as ckpt
from alphatpu.duel import DuelConfig
from alphatpu.games import make_game
from alphatpu.pipeline import PipelineConfig, init_pipeline, run_generation
from alphatpu.selfplay import SelfplayConfig
from alphatpu.train import TrainConfig


def tiny_config(tmp_path=None):
    return PipelineConfig(
        selfplay=SelfplayConfig(num_games=16, rollouts=12, cpuct=1.5),
        train=TrainConfig(batch_size=32, epochs=1),
        duel=DuelConfig(num_games=8, rollouts=8),
        buffer_capacity=4096,
        generations=2,
        width=32,
        depth=2,
        ckpt_dir=str(tmp_path) if tmp_path else None,
        log=lambda s: None,
    )


def test_two_generations_and_checkpoint(tmp_path):
    game = make_game("tictactoe")
    cfg = tiny_config(tmp_path)
    state = init_pipeline(game, cfg)
    p0 = jax.device_get(state.train_params["base"])

    state, stats1 = run_generation(game, state, cfg)
    assert stats1["generation"] == 1
    assert stats1["illegal_moves"] == 0
    assert sum(stats1["duel"]) == 8
    p1 = jax.device_get(state.train_params["base"])
    assert not np.allclose(p0, p1), "training changed no weights"

    state, stats2 = run_generation(game, state, cfg)
    assert stats2["generation"] == 2
    assert int(np.asarray(state.buffer.total)[0]) > 100

    # checkpoint roundtrip
    manifest_path = os.path.join(cfg.ckpt_dir, "latest.json")
    assert os.path.exists(manifest_path)
    fresh = init_pipeline(game, cfg)
    manifest, loaded = ckpt.load_checkpoint(
        cfg.ckpt_dir,
        best_params=fresh.best_params,
        train_params=fresh.train_params,
        opt_state=fresh.opt_state,
        rng=jax.random.key_data(fresh.rng),
    )
    assert manifest["generation"] == 2
    np.testing.assert_array_equal(
        np.asarray(loaded["train"]["base"]),
        np.asarray(state.train_params["base"]),
    )
    np.testing.assert_array_equal(
        np.asarray(loaded["best"]["base"]),
        np.asarray(state.best_params["base"]),
    )


def test_carry_checkpoint_roundtrip(tmp_path):
    """Continuous mode + save_buffer: the EpisodeCarry (in-flight episodes)
    round-trips through the checkpoint exactly, so a resume continues the
    episodes instead of dropping them."""
    from alphatpu.selfplay import make_carry

    game = make_game("tictactoe")
    cfg = tiny_config(tmp_path)
    cfg.selfplay = cfg.selfplay._replace(continuous=True, rounds=6)
    cfg.save_buffer = True
    state = init_pipeline(game, cfg)
    state, _ = run_generation(game, state, cfg)
    assert state.sp_carry is not None

    tmpl = make_carry(game, cfg.selfplay.num_games, jax.random.key(0))
    tmpl = tmpl._replace(rng=jax.random.key_data(tmpl.rng))
    manifest, loaded = ckpt.load_checkpoint(
        cfg.ckpt_dir,
        best_params=state.best_params,
        train_params=state.train_params,
        opt_state=state.opt_state,
        rng=jax.random.key_data(state.rng),
        buffer=state.buffer,
        sp_carry=tmpl,
    )
    assert manifest["has_carry"]
    got = loaded["sp_carry"]
    want = state.sp_carry._replace(
        rng=jax.random.key_data(state.sp_carry.rng))
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the carried episode state is non-trivial (some lane mid-episode)
    assert int(np.asarray(want.count).sum()) > 0


def test_cli_parser_matches_reference_flags():
    from alphatpu.cli import build_parser

    p = build_parser()
    args = p.parse_args(
        ["--game", "hex7", "--samples", "1024", "--rollout", "32",
         "--generation", "5", "--batchsize", "512", "--cpuct", "2.0"]
    )
    assert args.samples == 1024 and args.rollout == 32
    assert args.generation == 5 and args.batchsize == 512
    assert args.cpuct == 2.0
    # reference defaults (main4IARow.jl:88-116); --samples resolves
    # per game (16384 for reversi8x8, mainReversi8x8.jl:94)
    from alphatpu.cli import default_samples

    d = p.parse_args([])
    assert d.samples is None and d.rollout == 64 and d.generation == 100
    assert d.batchsize == 8192 and abs(d.cpuct - 1.5) < 1e-9
    assert default_samples("connect4") == 32768
    assert default_samples("reversi8x8") == 16384


def test_interactive_engine_plays_legally():
    """The G=1 engine returns a legal move with positive root probability
    (regression: the [A, G] root policy must be indexed games-minor)."""
    from alphatpu.interactive import make_engine
    from alphatpu.nets import apply_inference, config_for_game, init_params

    game = make_game("tictactoe")
    params = init_params(jax.random.key(0), config_for_game(game, width=32,
                                                            depth=2))
    engine = make_engine(game, apply_inference, rollouts=16, cpuct=1.5)

    pos = game.initial()
    # play a couple of engine-vs-engine plies
    for ply in range(3):
        action, pi = engine(params, pos, jax.random.key(ply))
        a = int(action)
        legal = np.asarray(game.legal_mask(pos))
        assert legal[a], f"ply {ply}: engine chose illegal move {a}"
        assert float(pi[a]) > 0
        assert abs(float(np.asarray(pi).sum()) - 1.0) < 0.05
        pos = jax.jit(game.play)(pos, a)


def test_eval_vs_random_counts():
    """vs-random evaluation plays the full game count and an MCTS-backed
    net (even with random weights) is not crushed by uniform random."""
    import jax

    from alphatpu.eval import EvalConfig, eval_vs_random
    from alphatpu.nets import apply_inference, config_for_game, init_params

    game = make_game("tictactoe")
    params = init_params(jax.random.key(0), config_for_game(game, width=32,
                                                            depth=2))
    cfg = EvalConfig(num_games=32, rollouts=16)
    w, d, l = eval_vs_random(game, apply_inference, params, jax.random.key(1),
                             cfg)
    assert w + d + l == 32
    assert w >= l  # 16-rollout search should not lose to random overall


def test_board_svg_all_games():
    """SVG renderer emits well-formed markup with the right stone counts."""
    import jax
    import jax.numpy as jnp

    from alphatpu.render import board_svg

    for name, moves in [
        ("tictactoe", [4, 0, 8]),
        ("connect4", [3, 3, 2]),
        ("hex5", [7, 12, 6]),
        ("reversi6x6", []),
    ]:
        game = make_game(name)
        pos = game.initial()
        for m in moves:
            pos = jax.jit(game.play)(pos, jnp.int32(m))
        svg = board_svg(game, pos)
        assert svg.startswith("<svg") and svg.endswith("</svg>")
        n_stones = svg.count("<circle")
        expected = len(moves) + (4 if name.startswith("reversi") else 0)
        assert n_stones == expected, (name, n_stones, expected)
        if name == "hex5":
            assert svg.count("<polygon") == 25  # inner 5x5 hexagons


def test_interactive_move_parsing():
    from alphatpu.games import make_game
    from alphatpu.interactive import move_name, parse_move

    c4 = make_game("connect4")
    assert parse_move(c4, "a1") == 0
    assert parse_move(c4, "d1") == 18
    assert move_name(c4, 18) == "d1"
    rev = make_game("reversi6x6")
    assert parse_move(rev, "pass") == 36
    assert move_name(rev, 36) == "pass"
    hexg = make_game("hex5")
    assert parse_move(hexg, "b3") == 7
    assert move_name(hexg, 7) == "b3"
