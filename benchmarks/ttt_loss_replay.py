"""Replay the TicTacToe default-protocol probe and attribute any loss.

Datatictactoe/probe.json records 0W/63D/1L for net80 under the default
8-ply sampling protocol and attributes the single loss to the sampling
phase entering a lost position (a plausible-but-unproven note, VERDICT r4
weak #6).  This script proves or refutes that attribution: it reruns
``eval_vs_probe`` with ``trace=True`` (bit-identical protocol, same seed),
finds each lost lane, and for every net move in that lane asks an EXACT
tictactoe negamax oracle:

* was the position already theoretically lost before the move?
* if not, did THIS move throw the game (value drops to lost)?
* if it threw the game: was it a sampled (non-greedy) pick of the
  temperature phase, and would the greedy pick have preserved the value?

Verdict per loss: ``sampling_induced`` (the blunder ply was a sampled
pick != greedy AND greedy preserved the draw/win) vs ``search_error``
(the greedy pick itself blunders, or the non-sampling phase blundered).

Usage: python benchmarks/ttt_loss_replay.py [ckpt] [temp_moves] [seed]
"""
import functools
import json
import sys

import numpy as np

# the 8 tictactoe lines hold in action-index space under either r+3c or
# c+3r cell numbering (transposition maps the set onto itself)
LINES = [(0, 1, 2), (3, 4, 5), (6, 7, 8), (0, 3, 6), (1, 4, 7), (2, 5, 8),
         (0, 4, 8), (2, 4, 6)]
LINE_MASKS = [sum(1 << a for a in t) for t in LINES]
FULL = (1 << 9) - 1


@functools.lru_cache(maxsize=None)
def solve(me: int, opp: int) -> int:
    """Exact negamax value for the side to move: +1 win, 0 draw, -1 loss.
    (me, opp) are 9-bit occupancy masks in action-index space; the
    previous mover is ``opp``, so a completed opp line means loss."""
    if any((opp & m) == m for m in LINE_MASKS):
        return -1
    if (me | opp) == FULL:
        return 0
    best = -1
    for a in range(9):
        b = 1 << a
        if (me | opp) & b:
            continue
        best = max(best, -solve(opp, me | b))
        if best == 1:
            return 1
    return best


def analyze(ckpt="Datatictactoe/net80.npz", temp_moves=8, seed=0,
            games=64, rollouts=64):
    import jax

    from alphatpu.checkpoint import load_pytree_like
    from alphatpu.games import make_game
    from alphatpu.nets import apply_inference, config_for_game, init_params
    from alphatpu.probe import eval_vs_probe, probe_for_game

    game = make_game("tictactoe")
    template = init_params(jax.random.key(0), config_for_game(game))
    state = load_pytree_like(ckpt, {"best": template, "train": template,
                                    "opt": None, "rng": None})
    w, d, l, tr = eval_vs_probe(
        game, apply_inference, state["best"], jax.random.key(seed),
        probe_for_game(game), num_games=games, rollouts=rollouts,
        temp_moves=temp_moves, seed=seed, trace=True)
    out = {"ckpt": ckpt, "temp_moves": temp_moves, "seed": seed,
           "score": [w, d, l], "losses": []}
    lost = np.where(tr["result"] == -tr["net_sign"])[0]
    for i in lost:
        me = opp = 0  # occupancy from the side to move's perspective
        verdict = None
        for rec in tr["records"]:
            if not rec["alive"][i]:
                break
            a = int(rec["action"][i])
            if rec["net_turn"][i]:
                v_before = solve(me, opp)
                v_after = -solve(opp, me | (1 << a))
                if v_before >= 0 and v_after == -1 and verdict is None:
                    g = int(rec["greedy"][i])
                    v_greedy = -solve(opp, me | (1 << g))
                    verdict = {
                        "lane": int(i),
                        "blunder_ply": rec["ply"],
                        "sampling_phase": bool(rec["sampling_phase"]),
                        "played": a,
                        "greedy": g,
                        "played_was_sampled_nongreedy": bool(
                            rec["sampling_phase"] and a != g),
                        "value_before": v_before,
                        "value_after_played": v_after,
                        "value_after_greedy": v_greedy,
                        "greedy_preserves": bool(v_greedy >= 0),
                    }
            me, opp = opp, me | (1 << a)
        if verdict is None:
            verdict = {"lane": int(i),
                       "note": "no net blunder ply found (lost from the "
                               "start of a net-second game?)"}
        else:
            verdict["sampling_induced"] = bool(
                verdict["played_was_sampled_nongreedy"]
                and verdict["greedy_preserves"])
        out["losses"].append(verdict)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    analyze(*(a[:1] or ["Datatictactoe/net80.npz"]),
            *(int(x) for x in a[1:3]))
