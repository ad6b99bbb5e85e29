#!/usr/bin/env python3
"""Compose docs/BENCH_SCALE_r11.json: full-suite per-query scale curves.

Primary curve: organic 1x tier -> organic 10x tier (same generator,
pure scale-up — the ratio that answers "is the engine linear").
Reference: the driver's sf0.1 testdata (different generator; shape
deltas like a 31-token degenerate vocabulary vs an organic Zipf tail
show up here and are expected).

Usage: scale_compare.py <org1x json> <tier json> <sf0.1 json> <k> <out>

Flag rule: organic ratio > k AND tier time > 2s (sub-second baselines
divide into jitter; the tier runs are single-pass so small ratios are
biased upward vs a min-of-3 floor)."""
import json, sys

org1, tier, sf, k, out = sys.argv[1], sys.argv[2], sys.argv[3], float(sys.argv[4]), sys.argv[5]
a = json.load(open(org1))
b = json.load(open(tier))
c = json.load(open(sf))
qa, qb, qc = a["queries"], b["queries"], c["queries"]

rows = {}
flagged = []
for q in sorted(qb):
    tb = qb[q]
    ta = qa.get(q)
    ts = qc.get(q)
    row = {"org1x_s": ta, "tier_s": tb, "sf01_s": ts,
           "org_ratio": None, "sf01_ratio": None}
    if isinstance(tb, (int, float)):
        row["tier_s"] = round(tb, 3)
        if isinstance(ta, (int, float)) and ta > 0:
            row["org1x_s"] = round(ta, 3)
            row["org_ratio"] = round(tb / ta, 2)
        if isinstance(ts, (int, float)) and ts > 0:
            row["sf01_s"] = round(ts, 3)
            row["sf01_ratio"] = round(tb / ts, 2)
    rows[q] = row
    if tb == "error":
        flagged.append({"query": q, "why": "error at tier"})
    elif row["org_ratio"] is not None and row["org_ratio"] > k and tb > 2.0:
        flagged.append({"query": q, "why": f"organic ratio {row['org_ratio']} > k={k}",
                        "tier_s": round(tb, 2)})

doc = {
    "metric": "scale_curve",
    "k": k,
    "tier": b.get("sf"),
    "action": b.get("action"),
    "org1x_run": {"file": org1, "total_s": a["value"], "passes": a.get("passes"),
                  "failed": a.get("failed")},
    "tier_run": {"file": tier, "total_s": b["value"], "passes": b.get("passes"),
                 "failed": b.get("failed"), "commit": b.get("commit"),
                 "generated_at": b.get("generated_at")},
    "sf01_run": {"file": sf, "total_s": c["value"], "passes": c.get("passes")},
    "total_org_ratio": round(b["value"] / a["value"], 2),
    "total_sf01_ratio": round(b["value"] / c["value"], 2),
    "super_linear": flagged,
    "queries": rows,
}
json.dump(doc, open(out, "w"), indent=1)
n_ok = sum(1 for r in rows.values() if r["org_ratio"] is not None)
print(f"{n_ok} compared, organic total ratio {doc['total_org_ratio']} "
      f"(vs sf0.1 {doc['total_sf01_ratio']}), {len(flagged)} flagged -> {out}")
for f in flagged:
    print("  FLAG:", f)
worst = sorted((r["org_ratio"], q) for q, r in rows.items()
               if r["org_ratio"] is not None and isinstance(r["tier_s"], float)
               and r["tier_s"] > 2.0)[-8:]
print("worst organic ratios (tier > 2s):")
for r, q in reversed(worst):
    print(f"  {q}: {r}  (tier {rows[q]['tier_s']}s)")
