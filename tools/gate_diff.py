#!/usr/bin/env python3
"""Gate-log drift dashboard: which query RESULTS changed between commits.

Usage:
  python3 tools/gate_diff.py              # working tree vs HEAD~1
  python3 tools/gate_diff.py <ref>        # working tree vs <ref>
  python3 tools/gate_diff.py <refA> <refB>

tools/gate_log.json records, per oracle-green query, the sha256 of its
oracle SQL, its normalized analyzed Spark plan (impl), and its sf0.01
result. This tool classifies every per-query change between two
commits so output drift is reviewable at a glance (the bench_diff.py
pattern):

  RESULT DRIFT   — result hash changed. Expected iff the query's
                   semantics intentionally changed (the oracle and/or
                   impl hash should have changed too, and the gate
                   replica re-passed). A result change with BOTH
                   impl and oracle hashes unchanged would mean
                   nondeterminism or a data change — investigate.
  impl-only      — plan changed, result identical: a pure refactor or
                   optimization, the best kind of diff.
  oracle+impl    — both sides edited together (the normal way a query
                   semantics change ships).
"""
import json
import subprocess
import sys

ARTIFACT = "tools/gate_log.json"


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

    print(f"gate log: {len(old)} entries ({labels[1]}) -> "
          f"{len(new)} entries ({labels[0]})")
    for name, side in (("added", set(new) - set(old)),
                       ("removed", set(old) - set(new))):
        if side:
            print(f"{name}: {', '.join(sorted(side))}")

    drift, impl_only, both, oracle_only, suspicious = [], [], [], [], []
    for k in sorted(set(new) & set(old)):
        n, o = new[k], old[k]
        res = n.get("result_sha256") != o.get("result_sha256")
        imp = n.get("impl_sha256") != o.get("impl_sha256")
        orc = n.get("oracle_sha256") != o.get("oracle_sha256")
        rows = (n.get("rows"), o.get("rows"))
        if res and n.get("sf") != o.get("sf"):
            # result hashes are sf-dependent; a re-check at another SF
            # is context, not drift
            print(f"  (note) {k}: last gate pass moved "
                  f"{o.get('sf')} -> {n.get('sf')}; result hash not comparable")
            res = False
        if res and not imp and not orc:
            suspicious.append((k, rows))
        elif res:
            drift.append((k, rows, imp, orc))
        elif imp and orc:
            both.append(k)
        elif imp:
            impl_only.append(k)
        elif orc:
            oracle_only.append(k)

    if suspicious:
        print("\n!! RESULT CHANGED WITH NO IMPL/ORACLE EDIT "
              "(nondeterminism or data change — investigate):")
        for k, rows in suspicious:
            print(f"  {k}  rows {rows[1]} -> {rows[0]}")
    if drift:
        print("\nresult drift (accompanied by an impl/oracle edit):")
        for k, rows, imp, orc in drift:
            sides = "+".join(s for s, c in (("impl", imp), ("oracle", orc)) if c)
            print(f"  {k}  rows {rows[1]} -> {rows[0]}  [{sides} edited]")
    if both:
        print(f"\nimpl+oracle edited, result identical: {', '.join(both)}")
    if impl_only:
        print(f"\nimpl-only (pure refactor/optimization): {', '.join(impl_only)}")
    if oracle_only:
        print(f"\noracle-only (re-expressed oracle, same result): "
              f"{', '.join(oracle_only)}")
    if not any((suspicious, drift, both, impl_only, oracle_only)):
        print("\nno per-query changes.")


if __name__ == "__main__":
    main()
