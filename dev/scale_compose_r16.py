#!/usr/bin/env python3
"""Compose docs/BENCH_SCALE_r16.json: TWO organic scale tiers (10x, 100x)
against the same organic 1x baseline, one artifact, on the final
round-16 HEAD.

Flag rule per tier: organic ratio > k AND tier time > 2s (sub-second
baselines divide into jitter; tier runs are single-pass so small
ratios are biased upward vs a min-of-3 floor).

Usage: scale_compose_r16.py [embcold_note]"""
import json
import sys

def load(p):
    return json.load(open(p))

org1 = load("docs/BENCH_SCALE_r16_org1x.json")
t10 = load("docs/BENCH_SCALE_r16_raw10.json")
t100 = load("docs/BENCH_SCALE_r16_raw100.json")
sf = load("docs/BENCH_SELF_r16.json")
embcold = sys.argv[1] if len(sys.argv) > 1 else ""

def tier(b, k):
    qa, qb = org1["queries"], b["queries"]
    rows, flagged = {}, []
    for q in sorted(qb):
        tb, ta = qb[q], qa.get(q)
        row = {"org1x_s": None, "tier_s": None, "org_ratio": None}
        if isinstance(tb, (int, float)):
            row["tier_s"] = round(tb, 3)
            if isinstance(ta, (int, float)) and ta > 0:
                row["org1x_s"] = round(ta, 3)
                row["org_ratio"] = round(tb / ta, 2)
        rows[q] = row
        if tb == "error":
            flagged.append({"query": q, "why": "error at tier"})
        elif row["org_ratio"] is not None and row["org_ratio"] > k and tb > 2.0:
            flagged.append({"query": q, "why": f"organic ratio {row['org_ratio']} > k={k}",
                            "tier_s": round(tb, 2)})
    return {
        "k": k, "tier": b.get("sf"),
        "run": {"total_s": round(b["value"], 1), "passes": b.get("passes"),
                "failed": b.get("failed"), "commit": b.get("commit"),
                "generated_at": b.get("generated_at")},
        "total_org_ratio": round(b["value"] / org1["value"], 2),
        "super_linear": flagged,
        "queries": rows,
    }

doc = {
    "metric": "scale_curve",
    "action": t100.get("action"),
    "org1x_run": {"file": "docs/BENCH_SCALE_r16_org1x.json",
                  "total_s": round(org1["value"], 1),
                  "passes": org1.get("passes"), "failed": org1.get("failed"),
                  "commit": org1.get("commit")},
    "sf01_run": {"file": "docs/BENCH_SELF_r16.json",
                 "total_s": round(sf["value"], 1), "passes": sf.get("passes"),
                 "commit": sf.get("commit")},
    "tiers": [tier(t10, 10.0), tier(t100, 100.0)],
    "embcold_note": embcold,
    "method": (
        "Organic scale curve, full 167-query suite: 1x -> 10x -> 100x "
        "tiers from the same generator (DevSfGen, unchanged since r11; "
        "tiers regenerated this round — the r15 dirs were reclaimed — "
        "TIER_OK verified; embeddings 2k -> 20k -> 200k vectors). All "
        "three tier runs are single-pass (SPARK_GRAFT_BENCH_PASSES=1) "
        "from ONE chain on the final round-16 HEAD, AFTER this round's "
        "optimization commits (VERDICT r15 #5: the r15 chain predated "
        "its optimization commits). The q_emb_neardup cold/warm JIT "
        "residual was adjudicated in r13 (DevEmbCold) and is unchanged; "
        "see embcold_note."
    ),
}
json.dump(doc, open("docs/BENCH_SCALE_r16.json", "w"), indent=1)
t = doc["tiers"]
print(f"10x total ratio {t[0]['total_org_ratio']}, flags {t[0]['super_linear']}")
print(f"100x total ratio {t[1]['total_org_ratio']}, flags {t[1]['super_linear']}")
