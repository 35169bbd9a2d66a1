#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles (mirrors the driver's t2 gate,
but stricter): runs graft.Verify output against DuckDB on the same tables,
sorts columns by name and rows by all columns, and demands exact equality.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    # Queries that threw inside Verify write no output dir and would
    # silently drop out of the comparison below (round-9 lesson: the
    # testdata regen broke 11 queries and "all pass" shrank around
    # them). Surface them as hard failures.
    fail_manifest = os.path.join(out_dir, "verify_failures.json")
    if os.path.exists(fail_manifest):
        for name, msg in json.load(open(fail_manifest)).items():
            results[name] = f"VERIFY-THREW: {msg[:120]}"
    qdirs = [d for d in sorted(glob.glob(os.path.join(out_dir, "*"))) if os.path.isdir(d)]
    # Declared oracle queries with neither an output dir nor a recorded
    # failure (stale/partial verify run) must also be visible.
    have = {os.path.basename(d) for d in qdirs}
    for name in oracle:
        if name not in have and name not in results:
            results[name] = "NO-OUTPUT (not in verify_failures either)"
    for qd in qdirs:
        name = os.path.basename(qd)
        # A VERIFY-THREW entry must not be overwritten by a stale output
        # dir from a prior run in a reused outDir (overwrite-mode deletes
        # the target only at execution time, so analysis failures leave
        # old data in place).
        if name in results:
            continue
        # Read the Spark side NATIVELY (pyarrow), like the driver does —
        # round-1 lesson: routing it through DuckDB normalized decimals
        # identically on both sides and hid 9 driver hash failures.
        parts = sorted(glob.glob(os.path.join(qd, "*.parquet")))
        if not parts:
            results[name] = "NO-PART-FILES (aborted write?)"
            continue
        got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS-ONLY ({len(got)} rows)" if len(got) > 0 else "EMPTY-RESULT!"
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(g.columns)} duckdb={list(e.columns)}"
        elif [str(t) for t in g.dtypes] != [str(t) for t in e.dtypes]:
            bad_cols = [f"{c}: spark={g[c].dtype} duckdb={e[c].dtype}"
                        for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
            results[name] = f"DTYPE-MISMATCH {bad_cols}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(g)} duckdb={len(e)}"
        else:
            try:
                verdict = None
                if not g.equals(e):
                    # find first differing cell for debugging
                    diff = None
                    for c in g.columns:
                        neq = (g[c].astype(str) != e[c].astype(str))
                        if neq.any():
                            i = neq.idxmax()
                            diff = f"col={c} row={i} spark={g[c][i]!r} duckdb={e[c][i]!r}"
                            break
                    if diff:
                        results[name] = f"VALUE-MISMATCH {diff}"
                        continue
                    verdict = "OK(strcast)"
                # values match after row-sorting (bitwise or str-cast);
                # ALSO require the emitted row ORDER to agree — the
                # driver's compare is order-sensitive, so a non-total
                # ORDER BY can pass the sorted check here yet flake the
                # gate (round-7 lesson: q_asof_join microsecond ties)
                gu = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
                eu = exp.reindex(sorted(exp.columns), axis=1).reset_index(drop=True)
                if not gu.astype(str).equals(eu.astype(str)):
                    neq = (gu.astype(str) != eu.astype(str)).any(axis=1)
                    i = neq.idxmax()
                    results[name] = (f"ROW-ORDER-MISMATCH first at row {i} "
                                     "(values equal after sorting — ORDER BY "
                                     "is not a total order)")
                else:
                    results[name] = verdict or "OK"
            except Exception as ex:
                results[name] = f"COMPARE-ERROR: {ex}"
    bad = 0
    for k in sorted(results):
        status = results[k]
        ok = status == "OK" or status.startswith("ROWS-ONLY") or status == "OK(strcast)"
        if not ok:
            bad += 1
        print(f"{'PASS' if ok else 'FAIL'}  {k}: {status}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
