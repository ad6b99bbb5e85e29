#!/usr/bin/env python3
"""Generate the synthetic XX-state FIA fixture (FIXTURES.md §3).

Static output committed under src/test/resources/fixture/ — rerun only
when scenarios change. Column order matches graft.fia.Ingest schemas
(Spark maps CSV columns by position when a schema is supplied).
"""
import csv, os

OUT = "src/test/resources/fixture"
os.makedirs(OUT, exist_ok=True)
NA = "NA"

# --- PLOT: CN,INVYR,STATECD,UNITCD,COUNTYCD,PLOT,DESIGNCD,INTENSITY
plots = [
    # P1: three surveys
    (101, 2005, 99, 1, 1, 1, 1, 1),
    (102, 2010, 99, 1, 1, 1, 1, 1),
    (103, 2015, 99, 1, 1, 1, 1, 1),
    # P2: single survey, no trees (empty plot)
    (201, 2010, 99, 1, 1, 2, 1, 1),
]
with open(f"{OUT}/XX_PLOT.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow("CN,INVYR,STATECD,UNITCD,COUNTYCD,PLOT,DESIGNCD,INTENSITY".split(","))
    w.writerows(plots)

# --- PLOTGEOM: CN,INVYR,ECOSUBCD
geom = [(101, 2005, "232Hd"), (102, 2010, "232Hd"), (103, 2015, "232Hd"),
        (201, 2010, "M242B")]
with open(f"{OUT}/XX_PLOTGEOM.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["CN", "INVYR", "ECOSUBCD"])
    w.writerows(geom)

# --- COND: CN,PLT_CN,INVYR,STATECD,UNITCD,COUNTYCD,PLOT,CONDID,
#           CONDPROP_UNADJ,PROP_BASIS,COND_STATUS_CD,STDORGCD
cond = [
    (1011, 101, 2005, 99, 1, 1, 1, 1, 1.0, "SUBP", 1, 0),
    (1021, 102, 2010, 99, 1, 1, 1, 1, 1.0, "SUBP", 1, 0),
    (1031, 103, 2015, 99, 1, 1, 1, 1, 1.0, "SUBP", 1, 0),
    # condition 2 on P1 2015: non-sampled
    (1032, 103, 2015, 99, 1, 1, 1, 2, 0.5, "SUBP", 2, 0),
    # condition 3 on P1: planted stand (STDORGCD 1)
    (1013, 101, 2005, 99, 1, 1, 1, 3, 0.4, "SUBP", 1, 1),
    (1023, 102, 2010, 99, 1, 1, 1, 3, 0.4, "SUBP", 1, 1),
    # empty plot P2
    (2011, 201, 2010, 99, 1, 1, 2, 1, 1.0, "SUBP", 1, 0),
]
with open(f"{OUT}/XX_COND.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow("CN,PLT_CN,INVYR,STATECD,UNITCD,COUNTYCD,PLOT,CONDID,CONDPROP_UNADJ,PROP_BASIS,COND_STATUS_CD,STDORGCD".split(","))
    w.writerows(cond)

# --- TREE: CN,PLT_CN,INVYR,STATECD,UNITCD,COUNTYCD,PLOT,SUBP,TREE,CONDID,
#   MORTYR,STATUSCD,RECONCILECD,DECAYCD,STANDING_DEAD_CD,DIA,CR,HT,
#   ACTUALHT,CULL,SPCD,TPA_UNADJ,CARBON_AG,DRYBIO_AG
def tr(cn, plt, yr, tree, condid, mortyr, status, reconcile, decay, sdc,
       dia, cr, ht, aht, cull, spcd):
    return (cn, plt, yr, 99, 1, 1, 1, 1, tree, condid, mortyr, status,
            reconcile, decay, sdc, dia, cr, ht, aht, cull, spcd, NA, NA, NA)

trees = [
    # T1 live growth over three surveys (plain interpolation)
    tr(90011, 101, 2005, 1, 1, NA, 1, NA, NA, NA, 10.0, 40.0, 60.0, NA, 0.0, 131),
    tr(90012, 102, 2010, 1, 1, NA, 1, NA, NA, NA, 12.0, 45.0, 70.0, NA, 0.0, 131),
    tr(90013, 103, 2015, 1, 1, NA, 1, NA, NA, NA, 14.0, 50.0, 80.0, NA, 0.0, 131),
    # T2 live -> standing dead with recorded MORTYR 2006 (nudge vs midpoint)
    tr(90021, 101, 2005, 2, 1, NA, 1, NA, NA, NA, 11.0, 40.0, 65.0, NA, 0.0, 131),
    tr(90022, 102, 2010, 2, 1, 2006, 2, NA, 2, 1, 11.5, NA, 66.0, NA, 0.0, 131),
    # T3 live -> fallen dead with NA measurements (extrapolation path)
    tr(90031, 101, 2005, 3, 1, NA, 1, NA, NA, NA, 8.0, 35.0, 50.0, NA, 0.0, 316),
    tr(90032, 102, 2010, 3, 1, NA, 2, NA, NA, 0, NA, NA, NA, NA, NA, 316),
    # T4 single survey (carry-forward)
    tr(90041, 102, 2010, 4, 1, NA, 1, NA, NA, NA, 9.0, 30.0, 55.0, NA, 0.0, 131),
    # T5 sapling (DIA < 5; TPA sapling tier; CULL -> NA)
    tr(90051, 101, 2005, 5, 1, NA, 1, NA, NA, NA, 2.0, 20.0, 20.0, NA, NA, 316),
    tr(90052, 102, 2010, 5, 1, NA, 1, NA, NA, NA, 4.0, 25.0, 30.0, NA, NA, 316),
    # T6 woodland species (JENKINS 10: excluded from carbon)
    tr(90061, 101, 2005, 6, 1, NA, 1, NA, NA, NA, 6.0, 30.0, 10.0, NA, 0.0, 475),
    tr(90062, 102, 2010, 6, 1, NA, 1, NA, NA, NA, 7.0, 30.0, 12.0, NA, 0.0, 475),
    # T7 moves to non-sampled condition in 2015
    tr(90071, 101, 2005, 7, 1, NA, 1, NA, NA, NA, 10.0, 40.0, 62.0, NA, 0.0, 131),
    tr(90073, 103, 2015, 7, 2, NA, 1, NA, NA, NA, 12.0, 42.0, 72.0, NA, 0.0, 131),
    # T8 broken top (ACTUALHT < HT)
    tr(90081, 101, 2005, 8, 1, NA, 1, NA, NA, NA, 15.0, 40.0, 80.0, 60.0, 5.0, 131),
    tr(90082, 102, 2010, 8, 1, NA, 1, NA, NA, NA, 16.0, 42.0, 85.0, 62.0, 5.0, 131),
    # T9 species change (last SPCD wins)
    tr(90091, 101, 2005, 9, 1, NA, 1, NA, NA, NA, 9.0, 35.0, 52.0, NA, 0.0, 131),
    tr(90092, 102, 2010, 9, 1, NA, 1, NA, NA, NA, 10.0, 36.0, 56.0, NA, 0.0, 316),
    # T10 planted loblolly (CONDID 3, STDORGCD 1 -> "1_131" coefficients)
    tr(90101, 101, 2005, 10, 3, NA, 1, NA, NA, NA, 10.0, 40.0, 60.0, NA, 0.0, 131),
    tr(90102, 102, 2010, 10, 3, NA, 1, NA, NA, NA, 11.0, 41.0, 64.0, NA, 0.0, 131),
]
with open(f"{OUT}/XX_TREE.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow("CN,PLT_CN,INVYR,STATECD,UNITCD,COUNTYCD,PLOT,SUBP,TREE,CONDID,MORTYR,STATUSCD,RECONCILECD,DECAYCD,STANDING_DEAD_CD,DIA,CR,HT,ACTUALHT,CULL,SPCD,TPA_UNADJ,CARBON_AG,DRYBIO_AG".split(","))
    w.writerows(trees)

print("wrote fixture to", OUT)
