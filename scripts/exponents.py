#!/usr/bin/env python3
"""Per-query / per-family scaling exponents between two bench records.

Usage: python3 scripts/exponents.py BENCH_A.json BENCH_B.json RATIO
  RATIO = data-size ratio B/A (e.g. 3.333 for sf3->sf10).
Prints every query's time ratio and exponent e = ln(tB/tA)/ln(RATIO),
sorted by exponent, plus per-family aggregates. Dev tool (SCALE.md's
rung audit) — not part of the shipped library.
"""
import json, math, sys

def fam_of(name, fams_a, fams_b):
    return None

def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3])
    qa, qb = a.get("median", a.get("queries")), b.get("median", b.get("queries"))
    shared = sorted(set(qa) & set(qb))
    rows = []
    for q in shared:
        ta, tb = qa[q], qb[q]
        if ta <= 0 or tb <= 0:
            continue
        r = tb / ta
        e = math.log(r) / math.log(ratio)
        rows.append((e, r, ta, tb, q))
    rows.sort(reverse=True)
    print(f"{'exponent':>8} {'ratio':>7} {'tA':>8} {'tB':>8}  query")
    for e, r, ta, tb, q in rows:
        flag = " <== super-linear" if e > 1.0 and tb > 1.0 else ""
        print(f"{e:8.2f} {r:7.2f} {ta:8.2f} {tb:8.2f}  {q}{flag}")
    fa, fb = a.get("families", {}), b.get("families", {})
    if fa and fb:
        print("\nfamilies:")
        for f in sorted(set(fa) & set(fb)):
            if fa[f] > 0 and fb[f] > 0:
                e = math.log(fb[f] / fa[f]) / math.log(ratio)
                print(f"{e:8.2f} {fb[f]/fa[f]:7.2f} {fa[f]:8.1f} {fb[f]:8.1f}  {f}")
    ta, tb = sum(qa[q] for q in shared), sum(qb[q] for q in shared)
    print(f"\nshared-total: {ta:.1f} -> {tb:.1f}  x{tb/ta:.2f} at x{ratio} data "
          f"(e={math.log(tb/ta)/math.log(ratio):.2f}, n={len(shared)})")

if __name__ == "__main__":
    main()
