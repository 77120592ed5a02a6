"""Step-indexed AMR trajectory diff: localize the first divergence
between two amr_golden.py trace files (the bisection instrument for
amr/README.md row parity, VERDICT round-2 ask #3).

Usage: python scripts/amr_trace_diff.py A.json B.json

Reports, in step order:
  * the first step where |e| diverges beyond round-off (> 1e-10 rel),
  * the first step where the refine/deref DECISIONS differ (n_ref /
    n_deref / NE mismatch) — the zone-flip event,
  * the |e| relative difference trajectory at selected steps.
"""

import json
import sys


def load(path):
    recs = json.load(open(path))
    steps = {}
    for r in recs:
        if "t" in r and "ti" in r:
            steps[r["ti"]] = r
    return steps


def main(pa, pb):
    A, B = load(pa), load(pb)
    common = sorted(set(A) & set(B))
    if not common:
        print("no common steps")
        return
    first_e = None
    first_flip = None
    print(f"common steps: {common[0]}..{common[-1]} ({len(common)})")
    for ti in common:
        a, b = A[ti], B[ti]
        de = abs(a["e_norm"] - b["e_norm"]) / abs(a["e_norm"])
        flip = (a["NE"] != b["NE"] or a["n_ref"] != b["n_ref"]
                or a["n_deref"] != b["n_deref"])
        if first_e is None and de > 1e-10:
            first_e = ti
            print(f"FIRST |e| DIVERGENCE (>1e-10 rel): step {ti}: "
                  f"{a['e_norm']:.12e} vs {b['e_norm']:.12e} "
                  f"(rel {de:.2e}); NE {a['NE']} vs {b['NE']}")
        if first_flip is None and flip:
            first_flip = ti
            print(f"FIRST DECISION FLIP: step {ti}: "
                  f"NE {a['NE']} vs {b['NE']}, "
                  f"n_ref {a['n_ref']} vs {b['n_ref']}, "
                  f"n_deref {a['n_deref']} vs {b['n_deref']}")
        if ti % 100 == 0 or ti == common[-1]:
            print(f"  step {ti:5d}: |e| rel diff {de:.2e}  "
                  f"NE {a['NE']}/{b['NE']}")
    if first_e is None:
        print("no |e| divergence above 1e-10 in the common range")
    if first_flip is None:
        print("no refine/deref decision flips in the common range")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
