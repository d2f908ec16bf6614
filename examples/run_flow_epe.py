"""Flow-EPE parity harness driver.

Runs the in-repo flow estimators (dense LK, LK-seeded NCC, LK-seeded
MOSSE) over analytic-GT synthetic pairs with the reference's
magnitude-binned EPE evaluation and writes FLOW_EPE.md next to
BASELINE.md (reference rows included for context; data differs — Sintel
is not obtainable here — so the comparison is of harness + estimator
behavior, not a same-data score).

Usage: python examples/run_flow_epe.py [--pairs 6] [--out FLOW_EPE.md]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--out", default="FLOW_EPE.md")
    args = ap.parse_args()

    from invcompcamtrack_tpu.match.flow_bench import run_benchmark

    rng = np.random.default_rng(0)
    agg, rows = run_benchmark(rng, n_pairs=args.pairs)

    for m, d in agg.items():
        print(f"{m:6s}: all {d['all']:.3f}  <10 {d['s<10']:.3f}  "
              f"10-40 {d['s10-40']:.3f}  >=40 {d['s>=40']:.3f}")

    lines = [
        "# FLOW_EPE — flow-quality parity harness",
        "",
        "Magnitude-binned endpoint error (the reference's metric,",
        "`run_OF_NCC_eval.py:195-211`) of the in-repo flow estimators on",
        f"{args.pairs} analytic-GT plane-scene pairs (640x480) whose motion",
        "spans the <10 / 10-40 / >=40 px bins.  Sintel is not obtainable in",
        "this environment, so the data differs from the reference's recorded",
        "rows (included below for context): this table validates that the",
        "replacement estimators behave sanely across the same magnitude",
        "regime, not a same-data score.  Points whose GT correspondence",
        "leaves frame 1 are excluded (KITTI-style validity).",
        "",
        "| method | EPE all | <10px | 10-40px | >=40px |",
        "|---|---|---|---|---|",
    ]
    for m in ("lk", "ncc", "mosse"):
        d = agg[m]
        lines.append(f"| {m} (ours) | {d['all']:.3f} | {d['s<10']:.3f} "
                     f"| {d['s10-40']:.3f} | {d['s>=40']:.3f} |")
    lines += [
        "| DIS (reference, Sintel) | 5.154 | 2.511 | 10.503 | 30.808 |",
        "| NCC (reference, Sintel) | 5.454 | 2.557 | 9.861 | 32.335 |",
        "| MOSSE (reference, Sintel) | 5.205 | 2.528 | 9.595 | 30.593 |",
        "",
        "`lk` = dense pyramidal LK (the OF_DIS replacement); `ncc`/`mosse` =",
        "LK-seeded correlation refinement at grid points (the reference's NCC",
        "and MOSSE variants are likewise seeded by DIS flow).",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
