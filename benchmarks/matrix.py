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

# (game, lanes, bf16, chunk, rounds): chunk > 0 bounds single-execution
# length (rounds per jit call) - executions past ~40 s crash the
# time-shared tunnel worker, so the big shapes run chained-carry chunks
# (bit-identical, see bench.measure).  rounds=0 uses the default
# (>= 2 full games per lane); the 13x13 boards run fewer rounds - bench
# counts carried in-flight rows, so a shorter run still measures
# steady-state throughput exactly.  The 32,768-lane row runs as 4
# device-sequential 8192-lane superblocks (bench.measure, disclosed in
# extra) - the r3/r4-measured per-lane cliff past ~8k lockstep lanes.
# Each row: (game, lanes, bf16, chunk, rounds, pack_level).
# pack_level 0 = the production default (2-plane packed kernel);
# 2 = the 1-plane (prior | wsum | visits) kernel, measured opt-in
# (benchmarks/ab_r5).  The 13x13 rows run FULL game windows (rounds >=
# 2x max game length, chunked for the time-shared tunnel) so
# samples_written > 0 exercises termination/back-fill on-chip.
CONFIGS = [
    ("tictactoe", 1024, False, 0, 0, 0),
    ("connect4", LANES, False, 0, 0, 0),
    ("connect4", LANES, True, 0, 0, 0),
    # the reference's literal 32,768-game shape
    ("connect4", 32768, False, 84, 0, 0),
    ("hex7", LANES, False, 0, 0, 0),
    ("hex7", LANES, True, 0, 0, 0),
    ("gobang9", LANES, False, 0, 0, 0),
    ("gobang9", LANES, True, 0, 0, 0),
    ("reversi6x6", LANES, False, 0, 0, 0),
    ("reversi8x8", LANES, False, 0, 0, 0),
    ("reversi8x8", LANES, True, 0, 0, 0),
    # the 13x13 boards (A=169): fused kernel path since r4
    ("hex13", 2048, False, 16, 352, 0),
    ("gobang13", 2048, False, 16, 352, 0),
    # the 1-plane packed kernel (ALPHATPU_PACK=2, benchmarks/ab_r5)
    ("connect4", LANES, False, 0, 0, 2),
    ("hex7", LANES, False, 0, 0, 2),
    ("gobang9", LANES, False, 0, 0, 2),
    ("reversi8x8", LANES, False, 0, 0, 2),
    ("hex13", 2048, False, 16, 352, 2),
    ("gobang13", 2048, False, 16, 352, 2),
]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_r5.json")
    results = []
    import jax

    for game, lanes, bf16, chunk, rounds, pack in CONFIGS:
        # the pack level is read from the env at trace time; same-shape
        # rows would otherwise reuse the previous level's cached trace
        if pack:
            os.environ["ALPHATPU_PACK"] = str(pack)
        else:
            os.environ.pop("ALPHATPU_PACK", None)
        jax.clear_caches()
        try:
            r = measure(game, games=lanes, rollouts=ROLLOUTS, bf16=bf16,
                        chunk=chunk, rounds=rounds)
            if pack:
                r["metric"] += f"_l{pack}"
                r["extra"]["pack_level"] = pack
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
