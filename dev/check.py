#!/usr/bin/env python3
"""Dev-only harness approximating the driver's correctness gate.

Runs graft.Verify's parquet dumps against the DuckDB oracle SQL and
compares values (columns sorted by name, rows sorted by all columns).
NOT part of the shipped library — uses the driver-side python stack.

Usage: python3 dev/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        got = duckdb.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        rel = con.sql(oracle[name])
        # The driver hashes stringified values: a DuckDB HUGEINT becomes
        # pandas float64 ("1.0" vs spark's "1") and hash-mismatches even
        # when values compare equal numerically — fail it here too.
        huge = [c for c, t in zip(rel.columns, rel.types) if str(t) == "HUGEINT"]
        if huge:
            print(f"[FAIL-dtype] {name}: oracle HUGEINT cols {huge} — CAST to BIGINT in the SQL")
            n_bad += 1
            continue
        exp = rel.df()
        g, e = canon(got), canon(exp)
        # Column-list check FIRST: the dtype loop below indexes the
        # oracle frame by the spark frame's columns and would KeyError
        # (aborting the whole harness) on a schema mismatch.
        if list(g.columns) != list(e.columns):
            print(f"[FAIL-schema] {name}: spark={list(g.columns)} oracle={list(e.columns)}")
            n_bad += 1
            continue
        # Same stringification class (int vs float vs other) is what the
        # driver's value hash needs — int32 vs int64 is fine, int vs
        # float is not.
        def kind(s):
            k = s.dtype.kind
            return {"i": "int", "u": "int", "f": "float"}.get(k, "other")
        dt_bad = [c for c in g.columns if kind(g[c]) != kind(e[c])]
        if dt_bad:
            print(f"[FAIL-dtype] {name}: " + "; ".join(
                f"{c}: spark={g[c].dtype} oracle={e[c].dtype}" for c in dt_bad))
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"[FAIL-rows] {name}: spark={len(g)} oracle={len(e)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                detail = f"{c}: row{idx} spark={a[idx]!r} oracle={b[idx]!r}"
                if pd.api.types.is_numeric_dtype(a):
                    try:
                        detail += f" maxabsdiff={(a - b).abs().max()}"
                    except Exception:
                        pass
                bad_cols.append(detail)
        if bad_cols:
            print(f"[FAIL-vals] {name}: " + "; ".join(bad_cols[:3]))
            n_bad += 1
        else:
            print(f"[ok] {name}: {len(g)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad, {len(oracle)} oracles")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
