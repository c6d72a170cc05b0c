"""Full BASELINE.json config-matrix benchmark -> benchmarks/results_r<N>.json.

One entry per headline workload config (BASELINE.json `configs`), each with
its per-game reference net, at the single-chip production lane count, in
f32 and bf16-inference variants, plus a 32768-lane Connect-4 entry that
measures the lanes x rounds equivalence of the reference's
32,768-games/generation shape.

Usage: python benchmarks/matrix.py [out.json]
Env: MATRIX_GAMES (lane count, default 8192), MATRIX_ROLLOUTS (64).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure  # noqa: E402

LANES = int(os.environ.get("MATRIX_GAMES", 8192))
ROLLOUTS = int(os.environ.get("MATRIX_ROLLOUTS", 64))

# (game, lanes, bf16) - the BASELINE.json config list, both precisions for
# the headline rows, plus the 32k-lane shape check.
CONFIGS = [
    ("tictactoe", 1024, False),
    ("connect4", LANES, False),
    ("connect4", LANES, True),
    ("connect4", 32768, False),  # the reference's literal 32,768-game shape
    ("hex7", LANES, False),
    ("hex7", LANES, True),
    ("gobang9", LANES, False),
    ("gobang9", LANES, True),
    ("reversi6x6", LANES, False),
    ("reversi8x8", LANES, False),
    ("reversi8x8", LANES, True),
    ("hex13", 2048, False),  # A=169 widest-board datapoint
]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_r2.json")
    results = []
    for game, lanes, bf16 in CONFIGS:
        try:
            r = measure(game, games=lanes, rollouts=ROLLOUTS, bf16=bf16)
        except Exception as e:  # record the failure instead of dying
            r = {"metric": f"{game}_g{lanes}" + ("_bf16" if bf16 else ""),
                 "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(r), flush=True)
        results.append(r)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
