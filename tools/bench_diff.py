#!/usr/bin/env python3
"""Round-over-round bench comparison over the committed artifact.

Usage:
  python3 tools/bench_diff.py              # working tree vs HEAD~1
  python3 tools/bench_diff.py <ref>        # working tree vs <ref>
  python3 tools/bench_diff.py <refA> <refB>

Reads bench_results.json (full 263-query map) from each side and prints
total drift plus the queries that moved most, with a noise hint: the
r8/r9 episode showed identical bytecode drifting 25% run-over-run, so
only flag a query when BOTH the ratio and the absolute delta are large.
"""
import json
import subprocess
import sys

ARTIFACT = "bench_results.json"


def load(ref):
    if ref is None:
        with open(ARTIFACT) as f:
            return json.load(f)
    out = subprocess.run(["git", "show", f"{ref}:{ARTIFACT}"],
                         capture_output=True, text=True)
    if out.returncode != 0:
        sys.exit(f"no {ARTIFACT} at {ref}: {out.stderr.strip()}")
    return json.loads(out.stdout)


def main():
    args = sys.argv[1:]
    if len(args) == 0:
        new, old, labels = load(None), load("HEAD~1"), ("worktree", "HEAD~1")
    elif len(args) == 1:
        new, old, labels = load(None), load(args[0]), ("worktree", args[0])
    else:
        new, old, labels = load(args[1]), load(args[0]), (args[1], args[0])

    qn, qo = new["queries"], old["queries"]
    print(f"total: {old['value']:.1f}s ({labels[1]}) -> {new['value']:.1f}s "
          f"({labels[0]})  [{new['n_queries']} vs {old['n_queries']} queries]")
    for name, side in (("added", set(qn) - set(qo)), ("removed", set(qo) - set(qn))):
        if side:
            print(f"{name}: {', '.join(sorted(side))}")

    # Per-run spread (round 11): Bench records every raw run per query
    # in "runs"; a round-over-round delta inside the union of the two
    # sides' observed spreads is contention, not a regression, and is
    # never flagged.
    rn, ro = new.get("runs", {}), old.get("runs", {})

    def spread(runs_map, k):
        rs = [r for r in runs_map.get(k, []) if r > 0]
        return (max(rs) - min(rs)) if len(rs) >= 2 else 0.0

    common = sorted(set(qn) & set(qo),
                    key=lambda k: abs(qn[k] - qo[k]), reverse=True)
    # Regressions only (round 13): each recorded value is the min of
    # 2-3 timed runs taken after a per-query warm throwaway, i.e. an
    # upper bound on the query's true steady-state cost. A LOWER new
    # number therefore cannot indicate a plan bug — it means the old
    # bound was loose (cold-JIT artifact) or the plan got faster; both
    # still print in the largest-moves list, just never as FLAG.
    flagged = [k for k in common
               if qn[k] - qo[k] >= 0.75
               and qn[k] >= 2.0 * max(qo[k], 0.05)
               and qn[k] - qo[k] > 1.5 * max(spread(rn, k), spread(ro, k))]
    print(f"\nlargest moves (flagged = slower by >=0.75s AND >=2x AND "
          f"outside the recorded per-run spread — below that is "
          f"in-bench noise; speed-ups print but never flag):")
    # every flagged query prints, even when absolute-delta ranking
    # would push it below the top-15 noise rows
    shown = [k for k in common if k in common[:15] or k in flagged]
    for k in shown:
        mark = " <-- FLAG" if k in flagged else ""
        sp = max(spread(rn, k), spread(ro, k))
        sptxt = f"  (spread {sp:.2f}s)" if sp > 0 else ""
        print(f"  {qo[k]:7.3f} -> {qn[k]:7.3f}  {k}{sptxt}{mark}")

    if rn:
        noisy = sorted(((spread(rn, k), k) for k in rn), reverse=True)[:5]
        print("\nnoisiest queries this run (max-min across recorded runs):")
        for sp, k in noisy:
            if sp > 0.25:
                print(f"  {sp:6.2f}s  {k}  runs={rn[k]}")


if __name__ == "__main__":
    main()
