#!/usr/bin/env python3
"""Compose docs/BENCH_SCALE_r12.json: TWO organic scale tiers (10x, 100x)
against the same organic 1x baseline, one artifact.

Flag rule per tier: organic ratio > k AND tier time > 2s (sub-second
baselines divide into jitter; tier runs are single-pass so small
ratios are biased upward vs a min-of-3 floor)."""
import json

def load(p):
    return json.load(open(p))

org1 = load("docs/BENCH_SCALE_r12_org1x.json")
t10 = load("docs/BENCH_SCALE_r12_raw.json")
t100 = load("docs/BENCH_SCALE_r12_raw100.json")
sf = load("docs/BENCH_SELF_r12.json")

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
    "late_additions": {
        "q_emb_neardup_banded": {
            "note": ("added after the tier chain (commit 32134f9/ac3d30c); "
                     "measured separately per tier under the same single-pass "
                     "regime. The first shape (union+distinct over candidate "
                     "pairs) filled the disk with shuffle spill at 100x; the "
                     "shipped shape dedupes at the FIRST colliding band so "
                     "pairs stream through the cosine filter unshuffled."),
            "org1x_s": 3.0, "t10_s": 5.71, "t100_s": 40.15,
            "org_ratio_10x": 1.9, "org_ratio_100x": 13.4,
        }
    },
    "org1x_run": {"file": "docs/BENCH_SCALE_r12_org1x.json",
                  "total_s": round(org1["value"], 1),
                  "passes": org1.get("passes"), "failed": org1.get("failed"),
                  "commit": org1.get("commit")},
    "sf01_run": {"file": "docs/BENCH_SELF_r12.json",
                 "total_s": round(sf["value"], 1), "passes": sf.get("passes"),
                 "commit": sf.get("commit")},
    "tiers": [tier(t10, 10.0), tier(t100, 100.0)],
    "method": (
        "Organic scale curve, full 161-query suite: 1x -> 10x -> 100x tiers "
        "from the same generator (DevSfGen, unchanged from r11: Zipf docs over "
        "the sf vocabulary head with the sf length profile, exponential event "
        "values matching sf0.1's shape, event SPAN scaling with k, weakly "
        "structured embeddings with ~2% planted near-dups, sparse TPC-H-ish "
        "keys; 32 splits/table; embeddings 2k -> 20k -> 200k vectors). All "
        "three tier runs are single-pass (SPARK_GRAFT_BENCH_PASSES=1) from the "
        "same chain on commit 7aa3a5c ('-dirty' = the chain's own earlier "
        "artifact writes; zero source changes between runs). "
        "ADJUDICATIONS. (1) q_emb_neardup: the round's first 100x run (commit "
        "77fa8fd) exposed the suite's one genuinely super-linear curve — "
        "0.67 s -> 288.8 s (ratio 429) from fixed 4-plane sign-LSH, whose "
        "within-bucket pair join is ~n^2/16. Fixed in 7aa3a5c by "
        "occupancy-targeted adaptive resolution (targetBucket=512: planes grow "
        "ceil(log2(n/512)), prefix-extending hyperplanes so grown resolution "
        "strictly REFINES the fixed output; <=8k vectors — both oracle tiers — "
        "resolve to exactly 4 planes, bit-identical results). Post-fix: 10x "
        "1.41 s (ratio 2.0), 100x 43.5 s cold single-pass / 13.4 s warm "
        "min-of-3 (SPARK_GRAFT_BENCH_ONLY probe), ratio 61 cold vs k=100. "
        "(2) q_rollup (r11's one unadjudicated near-linear curve, org_ratio "
        "9.13): this chain times it 0.86 s at 10x (ratio ~1.2) and 1.64 s at "
        "100x — the r11 number was staging+single-pass noise, confirmed twice "
        "(r12 warm min-of-3 re-probe 0.535 s, this clean chain). "
        "Worst 100x ratios after the fix (q_winnow_fp 49, q_value_deciles 29, "
        "q_profile 24) are posting-list/pair-volume effects of the organic "
        "Zipf tail plus single-pass cold-scan bias on a 2.1 GB tier; all are "
        "sub-linear vs the k=100 data scale and none trips the flag rule. "
        "WARM ADJUDICATION (min-of-3 re-probe on 437aecf, /tmp/warm_100x): "
        "q_winnow_fp 36.9s (ratio 39), q_value_deciles 11.8s (23), q_profile "
        "37.0s (22), q_bloom_prune 13.9s (16), q_pq_ann 12.6s (16), "
        "q_emb_neardup_banded 30.8s (10.3) — 10-25% below the cold "
        "single-pass figures, confirming the bias direction; plan hashes "
        "identical to the tier run."),
}
json.dump(doc, open("docs/BENCH_SCALE_r12.json", "w"), indent=1)
t = doc["tiers"]
print(f"10x total ratio {t[0]['total_org_ratio']}, flags {t[0]['super_linear']}")
print(f"100x total ratio {t[1]['total_org_ratio']}, flags {t[1]['super_linear']}")
