#!/usr/bin/env python3
"""Mechanical plan-fingerprint diff between two bench artifacts
(round-13 verdict #6: the r13 noise adjudication compared 156/162
fingerprints BY HAND in PLANS.md; this makes it one command).

Usage: plan_diff.py OLD.json NEW.json [--times]

Reads the "plans" map (per-query md5-of-canonicalized-physical-plan,
emitted by graft.Bench since r13) from both artifacts and reports:
  - identical / changed / added / removed fingerprint counts,
  - per-changed-query rows with the old/new hashes and, with --times,
    the old/new seconds and ratio — so "plan changed" vs "host was
    busy" is a table, not an argument.
Exit code 0 always (this is a reporting tool, not a gate)."""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    if "plans" not in d:
        sys.exit(f"{p}: no 'plans' map — artifact predates r13's Bench")
    return d


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    times = "--times" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    po, pn = old["plans"], new["plans"]
    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(po) & set(pn))
    same = [q for q in common if po[q] == pn[q]]
    changed = [q for q in common if po[q] != pn[q]]
    added = sorted(set(pn) - set(po))
    removed = sorted(set(po) - set(pn))
    print(f"fingerprints: {len(same)}/{len(common)} identical, "
          f"{len(changed)} changed, {len(added)} added, {len(removed)} removed")
    if changed:
        print("\nchanged (plan really moved — time deltas here are real):")
        for q in changed:
            row = f"  {q:28s} {po[q]} -> {pn[q]}"
            if times and isinstance(qo.get(q), (int, float)) \
                    and isinstance(qn.get(q), (int, float)):
                row += f"  {qo[q]:8.2f}s -> {qn[q]:8.2f}s ({qn[q]/qo[q]:.2f}x)"
            print(row)
    if added:
        print("\nadded: " + ", ".join(added))
    if removed:
        print("\nremoved: " + ", ".join(removed))
    if times and same:
        import statistics
        rs = [(qn[q] / qo[q], q) for q in same
              if isinstance(qo.get(q), (int, float))
              and isinstance(qn.get(q), (int, float)) and qo[q] > 0]
        if rs:
            med = statistics.median(r for r, _ in rs)
            print(f"\nunchanged-plan time ratio (new/old) median {med:.3f} "
                  f"over {len(rs)} queries — uniform drift here is HOST, "
                  "not regression")
            worst = sorted(rs, reverse=True)[:8]
            for r, q in worst:
                print(f"  {q:28s} {r:6.2f}x  ({qo[q]:.2f}s -> {qn[q]:.2f}s)")


if __name__ == "__main__":
    main()
