#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py [sfdir] [verify_out]

Assumes graft.Verify has already written <verify_out>/<name>/ parquet dirs
plus <verify_out>/oracle_sql.json. Registers each testdata parquet as a
DuckDB view named after the file, runs every oracle SQL, and compares
against the Spark result: columns sorted by name, rows in written order,
exact value equality (floats compared bit-exactly; small report on diff).

Round-2 addition: a REPR-level pass emulating the driver's hash gate. The
driver reads the Spark side via pandas (parquet DECIMAL -> Decimal objects
with fixed scale, e.g. str '212576.00') and the oracle via duckdb fetchdf
(DECIMAL -> float64, repr '212576.0'), sorts rows, and hashes cell
representations — so numerically-equal cells can STILL hash-mismatch.
Any REPR FAIL here predicts hash_match:false in CORRECTNESS_r{N}.json even
when the value pass is green. Fix the query's surfaced types (cast decimal
-> DOUBLE on both sides), don't relax this check.
"""
import duckdb, glob, json, math, os, sys
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir")
        n_fail += 1
        continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark read error: {e}")
        n_fail += 1
        continue

    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: columns spark={gcols} oracle={ecols}")
        n_fail += 1
        continue
    # dtype audit (warn-only: value compare below is authoritative, but a
    # dtype gap flags int32-vs-int64 style hazards for the driver's gate)
    for c in gcols:
        gd, ed = str(got[c].dtype), str(exp[c].dtype)
        if gd != ed:
            print(f"  WARN {name}.{c}: spark dtype={gd} oracle dtype={ed}")
    got, exp = got[gcols], exp[gcols]
    if len(got) != len(exp):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
        n_fail += 1
        continue
    def cell_eq(g, e):
        # array-valued cells come back as numpy arrays whose == is
        # elementwise; normalize to lists first
        if hasattr(g, "tolist"):
            g = g.tolist()
        if hasattr(e, "tolist"):
            e = e.tolist()
        if isinstance(g, float) and isinstance(e, float) \
                and math.isnan(g) and math.isnan(e):
            return True
        if g == e:
            return True
        try:
            if g is not None and e is not None:
                return float(g) == float(e)  # Decimal vs float repr
        except (TypeError, ValueError):
            pass
        return False

    bad = None
    for c in gcols:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (g, e) in enumerate(zip(gv, ev)):
            if not cell_eq(g, e):
                bad = (c, i, g, e)
                break
        if bad:
            break
    if bad:
        c, i, g, e = bad
        print(f"FAIL {name}: first diff col={c} row={i} spark={g!r} oracle={e!r}")
        n_fail += 1
        continue

    # ---- repr-level pass (driver hash emulation) ----
    # Spark side re-read the way the driver does: pandas/pyarrow.
    try:
        pgot = pd.concat([pd.read_parquet(f)
                          for f in sorted(glob.glob(f"{spark_dir}/*.parquet"))],
                         ignore_index=True)[gcols]
    except Exception as e:
        print(f"FAIL {name}: pandas read error (driver would crash too): {e}")
        n_fail += 1
        continue
    rbad = None
    arr_col = None
    for c in gcols:
        gv, ev = pgot[c].tolist(), exp[c].tolist()
        for i, (g, e) in enumerate(zip(gv, ev)):
            if hasattr(g, "tolist"):
                arr_col = c  # numpy array cell: unhashable for the driver
                rbad = (c, i, g, e)
                break
            gs, es = str(g), str(e)
            if gs != es and not (isinstance(g, float) and isinstance(e, float)
                                 and math.isnan(g) and math.isnan(e)):
                rbad = (c, i, gs, es)
                break
        if rbad:
            break
    if arr_col is not None:
        print(f"REPR FAIL {name}: col={arr_col} is array-valued — "
              f"the driver's sort_values crashes on unhashable cells "
              f"(surface it as array_join(array_sort(...)))")
        n_fail += 1
    elif rbad:
        c, i, g, e = rbad
        print(f"REPR FAIL {name}: col={c} row={i} spark={g!r} oracle={e!r} "
              f"(values equal but driver hash will mismatch)")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total")
sys.exit(1 if n_fail else 0)
