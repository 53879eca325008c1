#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB oracle compare.

Dev tooling only (runs with the driver-side python libs; the engine itself is
pure Scala/Spark). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
    python3 scripts/check.py /root/testdata/sf0.01 /tmp/graft_verify

Compares each Spark result parquet against DuckDB running the oracle SQL on
the same source parquet, with EXACT value equality (columns sorted by name,
rows sorted by all columns) — stricter than any plausible driver tolerance.
"""
import duckdb, glob, json, os, sys
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

# Queries allowed to return 0 rows (emptiness-asserting by design). Any other
# query producing 0 rows FAILS even if the oracle agrees: a 0=0 compare
# certifies nothing about the operator's behavior (the filter_in_subquery /
# embedding-dedup vacuous-oracle incidents). Keep this list empty unless an
# entry is individually justified here.
ZERO_OK = set()

con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            # duckdb returns DATE as python date objects; normalize
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif dt.startswith("float32"):
            df[c] = df[c].astype("float64")
        elif dt in ("int32", "int8", "int16", "uint32"):
            df[c] = df[c].astype("int64")
        elif dt == "bool":
            df[c] = df[c].astype("boolean")
    df = df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)
    return df

n_pass = n_fail = 0
results = {}  # name -> bool; dumped for gen_coverage.py to cite
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output at {spark_dir}")
        n_fail += 1
        results[name] = False
        continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}")
        n_fail += 1
        results[name] = False
        continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        results[name] = False
        continue
    if sorted(sdf.columns) != sorted(odf.columns):
        print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        n_fail += 1
        results[name] = False
        continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
        n_fail += 1
        results[name] = False
        continue
    if len(sdf) == 0 and name not in ZERO_OK:
        print(f"FAIL {name}: 0 rows (vacuous oracle — 0=0 certifies nothing; "
              f"allow-list in ZERO_OK only with justification)")
        n_fail += 1
        results[name] = False
        continue
    s, o = canon(sdf), canon(odf)
    bad = []
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype != ov.dtype:
            bad.append(f"dtype[{c}]: spark={sv.dtype} oracle={ov.dtype}")
            continue
        if str(sv.dtype).startswith("float"):
            eq = (sv.isna() & ov.isna()) | (sv == ov)
        else:
            eq = (sv.isna() & ov.isna()) | (sv.fillna("§null§") == ov.fillna("§null§")) \
                if sv.dtype == object else ((sv.isna() & ov.isna()) | (sv == ov))
        neq = ~eq.fillna(False)
        if neq.any():
            i = int(np.argmax(neq.values))
            bad.append(f"value[{c}]: {int(neq.sum())} diffs, first@{i}: "
                       f"spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}")
    if bad:
        print(f"FAIL {name} ({len(s)} rows): " + "; ".join(bad[:4]))
        n_fail += 1
        results[name] = False
    else:
        print(f"PASS {name} ({len(s)} rows)")
        n_pass += 1
        results[name] = True

# With an `only` filter, merge into the prior full run's record instead of
# clobbering it — otherwise gen_coverage.py would list every unfiltered query
# as locally unverified after a partial rerun.
path = f"{out}/check_results.json"
if only and os.path.exists(path):
    prior = json.load(open(path))
    if prior.get("sf") == sf:
        merged = prior.get("results", {})
        merged.update(results)
        results = merged
json.dump({"sf": sf, "results": results}, open(path, "w"), indent=0)
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
