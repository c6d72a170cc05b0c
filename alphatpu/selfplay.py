"""Self-play: a whole generation of games as ONE jitted program.

The reference plays moves in a host loop - every move round downloads the
root policies, pushes samples to a CPU buffer, applies moves with scalar
`play`, compacts finished games and re-uploads positions
(mcts_gpu.jl:477-579).  Here the entire generation is a single
``lax.scan`` over move indices with done-masking instead of compaction:
fixed shapes, zero host syncs, and the replay buffer is written in-graph.

Semantics preserved from the reference:
* move selection: sample proportional to the root policy while
  ``move < 25``, argmax afterwards (mcts_gpu.jl:518-524),
* the recorded sample is (root encoding, root policy, player-to-move);
  values/features are back-filled for all moves of a finished game
  (main4IARow.jl:65-75) - here via a closed-form fill after the scan,
* result bookkeeping and mean game length (mcts_gpu.jl:541-577).

Deviation (documented): the reference loops until every game terminates;
this scan is bounded by ``max_moves`` (default: the game's
``maxLengthGame``) and the rare game still running at the bound (possible
only for Reversi pass-chains) is excluded from the buffer and counted in
``stats['unfinished']``.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .buffer import ReplayBuffer, write_samples
from .mcts.newton import cdf_sample
from .mcts.search import run_mcts
from .mcts.tree import init_tree, reset_tree


class SelfplayConfig(NamedTuple):
    num_games: int = 32768  # reference --samples default (main4IARow.jl:93)
    rollouts: int = 64  # --rollout default (main4IARow.jl:97)
    cpuct: float = 1.5  # --cpuct default (main4IARow.jl:109)
    temp_moves: int = 25  # sample-vs-argmax cutoff (mcts_gpu.jl:518)
    max_moves: int | None = None  # defaults to game.max_game_length


def broadcast_initial(game, num_games: int):
    single = game.initial()
    return jax.tree.map(
        lambda leaf: jnp.broadcast_to(leaf, (num_games,) + leaf.shape), single
    )


def selfplay_generation(
    game, net_apply, params, buffer: ReplayBuffer, rng, cfg: SelfplayConfig
):
    """Play ``cfg.num_games`` games to completion with MCTS selfplay and
    write every (state, policy, player, value, fstate) sample to the buffer.

    Returns (buffer, stats) where stats is a dict of scalars:
    wins / draws / losses (from the first mover's perspective), mean_length,
    illegal_moves (the reference's "faute" check, mcts_gpu.jl:526-529) and
    unfinished.
    """
    G = cfg.num_games
    T = cfg.max_moves or game.max_game_length
    positions0 = broadcast_initial(game, G)
    tree0 = init_tree(game, positions0, cfg.rollouts)

    def move_body(carry, t):
        positions, done, result, fin_t, illegal, tree, rng = carry
        rng, k_mcts, k_samp = jax.random.split(rng, 3)

        tree = reset_tree(tree, positions)
        tree, pol = run_mcts(
            game,
            net_apply,
            params,
            tree,
            k_mcts,
            rollouts=cfg.rollouts,
            cpuct=cfg.cpuct,
            training=True,
        )

        root_enc = jax.vmap(game.encode)(positions).astype(jnp.int8)
        player_t = positions.player
        alive = ~done

        # pol is [A, G] (games-minor); sampling matches the reference's
        # Weights() draw: uniform * total mass, CDF walk.
        u = jax.random.uniform(k_samp, (G,)) * pol.sum(0)
        sampled = cdf_sample(pol, u)
        greedy = jnp.argmax(pol, axis=0).astype(jnp.int32)
        action = jnp.where(t < cfg.temp_moves, sampled, greedy)

        legal = jax.vmap(game.legal_mask)(positions)
        ok = jnp.take_along_axis(legal, action[:, None], axis=-1)[:, 0]
        illegal = illegal + (alive & ~ok).sum()

        newpos = jax.vmap(game.play)(positions, action)
        positions = jax.tree.map(
            lambda new, old: jnp.where(
                alive.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
            ),
            newpos,
            positions,
        )
        f, r = jax.vmap(game.is_over)(positions)
        newly = alive & f
        result = jnp.where(newly, r, result)
        fin_t = jnp.where(newly, t, fin_t)
        done = done | f

        out = (root_enc, pol, player_t, alive)
        return (positions, done, result, fin_t, illegal, tree, rng), out

    init = (
        positions0,
        jnp.zeros((G,), bool),
        jnp.zeros((G,), jnp.int8),
        jnp.zeros((G,), jnp.int32),
        jnp.int32(0),
        tree0,
        rng,
    )
    (positions, done, result, fin_t, illegal, _, _), outs = jax.lax.scan(
        move_body, init, jnp.arange(T)
    )
    enc_s, pol_s, player_s, alive_s = outs  # enc [T,G,in], pol [T,A,G]
    pol_s = jnp.moveaxis(pol_s, 1, 2)  # -> [T, G, A] for row-major buffer

    final_feat = jax.vmap(game.final_feature)(positions)  # [G, fsize]
    res_f = result.astype(jnp.float32)
    play_f = player_s.astype(jnp.float32)
    value_s = (1.0 + res_f[None, :] * play_f) / 2.0  # [T, G]
    fstate_s = final_feat[None, :, :] * player_s[:, :, None]  # [T, G, fsize]
    mask = alive_s & done[None, :]  # only moves of games that finished

    A = game.max_actions
    buffer = write_samples(
        buffer,
        enc_s.reshape(T * G, -1),
        pol_s.reshape(T * G, A),
        player_s.reshape(T * G),
        value_s.reshape(T * G),
        fstate_s.reshape(T * G, -1),
        mask.reshape(T * G),
    )

    stats = {
        "wins": ((result == 1) & done).sum(),
        "draws": ((result == 0) & done).sum(),
        "losses": ((result == -1) & done).sum(),
        # reference records the 0-based round index at termination
        # (mcts_gpu.jl:536, 576)
        "mean_length": jnp.where(
            done.any(), fin_t.sum() / jnp.maximum(done.sum(), 1), 0.0
        ),
        "illegal_moves": illegal,
        "unfinished": (~done).sum(),
        "samples_written": mask.sum(),
    }
    return buffer, stats
