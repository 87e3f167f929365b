#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle query in DuckDB against the parquet fixture tables, and compares
with the Spark result parquet at <verifyOutDir>/<name>/. Mirrors the
driver contract: columns sorted by name, rows sorted, exact value match
(floats must already be rounded identically on both sides).
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def hash_hazard_types(result_dir: str):
    """Physical-schema types in the Spark result parquet that the driver's
    hasher canonicalizes differently from the DuckDB-oracle side even when
    every cell value matches. pandas comparison below CANNOT see these —
    duckdb .df() floats both sides — so they are caught at the schema
    level. Returns (severity, msg) pairs: decimal128 is FAIL (the exact
    class that kept q180 driver-red / replica-green for two rounds);
    TIMESTAMP_NTZ is WARN only — q11/q34 ship NTZ outputs and are
    driver-green, so NTZ is surfaced but not failed."""
    parts = sorted(glob.glob(os.path.join(result_dir, "*.parquet")))
    if not parts:
        return []
    schema = pq.read_schema(parts[0])
    bad = []
    # Primary signal: Spark's logical schema in the footer — the arrow
    # view alone can't distinguish TIMESTAMP_NTZ from an INT96-written
    # LTZ timestamp (both surface tz-less in pyarrow).
    md = (schema.metadata or {}).get(b"org.apache.spark.sql.parquet.row.metadata")
    # tz-AWARE arrow timestamps (int64 micros with isAdjustedToUTC) are a
    # FAIL regardless of the Spark logical type: the baseline results are
    # INT96-written (tz-naive in pyarrow/pandas), so a tz-aware column
    # means the writer's encoding changed under the session — pandas
    # reads it as datetime64[ns, UTC] and the driver hasher canonicalizes
    # it differently (the q180 class, and it crashes the naive-dtype
    # compare path here). Caught once live: a session-wide
    # outputTimestampType pin leaking into the result dumps.
    for field in schema:
        if getattr(field.type, "tz", None):
            bad.append(("FAIL", f"{field.name}: {field.type} (tz-aware result "
                        "encoding — outputTimestampType leaked into the dump)"))
    if md:
        for f in json.loads(md)["fields"]:
            t = f["type"]
            if isinstance(t, str) and t.startswith("decimal"):
                bad.append(("FAIL", f"{f['name']}: {t} (cast to double — q175/q178 convention)"))
            elif t == "timestamp_ntz":
                bad.append(("WARN", f"{f['name']}: timestamp_ntz"))
        return bad
    for field in schema:
        ts = str(field.type)
        if ts.startswith("decimal"):
            bad.append(("FAIL", f"{field.name}: {ts} (cast to double — q175/q178 convention)"))
        elif ts == "timestamp[us]" and getattr(field.type, "tz", None) is None:
            # Spark writes NTZ as tz-less micros; INT96-LTZ shows as ns
            bad.append(("WARN", f"{field.name}: {ts} NTZ"))
    return bad


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("int") or dt.startswith("uint"):
            df[c] = df[c].astype("int64")
        elif dt.startswith("float"):
            df[c] = df[c].astype("float64")
        elif dt.startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_missing = 0
    result_dirs = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    # A query that THREW during Verify writes no result dir and would
    # otherwise silently vanish from this report (the q170/r6 failure
    # mode: the driver board simply had no row). Surface every declared
    # oracle with no result as a FAIL, with the recorded error if
    # graft.Verify left one in _errors.json.
    errors_path = os.path.join(out_dir, "_errors.json")
    verify_errors = {}
    if os.path.exists(errors_path):
        with open(errors_path) as f:
            verify_errors = json.load(f)
    for name in sorted(set(oracles) - set(result_dirs)):
        msg = verify_errors.get(name, "no result written (query threw in Verify)")
        print(f"FAIL  {name}: {msg}")
        n_fail += 1
    for name in result_dirs:
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_glob}')").df()
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            # driver contract smoke-checks rows > 0 for oracle-less queries
            if len(got) > 0:
                print(f"ROWS  {name}: rows={len(got)} (no oracle, rows-only)")
                n_missing += 1
            else:
                print(f"FAIL  {name}: 0 rows (no oracle; driver requires rows>0)")
                n_fail += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        # Driver-hash hazard gate: schema-level, BEFORE value compare —
        # value equality through pandas proves nothing about these types.
        hazards = hash_hazard_types(os.path.join(out_dir, name))
        fails = [m for sev, m in hazards if sev == "FAIL"]
        warns = [m for sev, m in hazards if sev == "WARN"]
        if warns:
            print(f"WARN  {name}: NTZ in result schema (driver-green class, "
                  f"watch it): {'; '.join(warns)}")
        if fails:
            print(f"FAIL  {name}: driver-hash hazard in result schema: "
                  f"{'; '.join(fails)}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns differ: spark={list(g.columns)} oracle={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: row count spark={len(g)} oracle={len(w)}")
            n_fail += 1
            continue
        # dtype check (schema match is part of the driver gate)
        dt_mismatch = [(c, str(g[c].dtype), str(w[c].dtype))
                       for c in g.columns if str(g[c].dtype) != str(w[c].dtype)]
        eq = g.equals(w)
        if not eq:
            # locate first differing cell for the report
            diff_cols = []
            for c in g.columns:
                s1, s2 = g[c], w[c]
                neq = ~((s1 == s2) | (s1.isna() & s2.isna()))
                if neq.any():
                    i = int(neq.idxmax())
                    diff_cols.append(f"{c}[row {i}]: spark={s1[i]!r} oracle={s2[i]!r}")
            print(f"FAIL  {name}: values differ: {'; '.join(diff_cols[:4])}")
            n_fail += 1
        elif dt_mismatch:
            print(f"WARN  {name}: values equal but dtypes differ: {dt_mismatch}")
            n_pass += 1
        else:
            print(f"PASS  {name}: rows={len(g)}")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_missing} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
