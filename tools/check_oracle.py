#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with the sf tables registered as
views, and compares: row count, column-name set, and value hash with columns
sorted by name and rows sorted by all columns. Exact match required (the
engine's queries are written to be bit-deterministic — see Relational.scala).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: timestamps -> iso str, floats stay float
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            # do NOT tuple-ize list/ndarray cells: the driver's harness
            # can't hash them (sort_values -> "unhashable type"), so the
            # local gate must fail the same way. Gated queries encode
            # arrays as strings (array_join / array_to_string).
            for v in df[c].head(5):
                if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                    raise TypeError(
                        f"array-valued cell in column {c!r}: the driver's "
                        "comparator cannot hash these; csv-encode the gated "
                        "projection")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        except TypeError as e:
            results[name] = f"ARRAY-CELL: {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)"
            continue
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA-MISMATCH got={list(got.columns)} exp={list(exp.columns)}"
        elif len(got) != len(exp):
            results[name] = f"ROWCOUNT-MISMATCH got={len(got)} exp={len(exp)}"
        elif list(map(str, got.dtypes)) != list(map(str, exp.dtypes)):
            results[name] = ("DTYPE-MISMATCH " + str(
                [(c, str(a), str(b)) for c, a, b in
                 zip(got.columns, got.dtypes, exp.dtypes) if str(a) != str(b)]))
        else:
            eq = got.equals(exp)
            if not eq:
                # find first differing cell for debugging
                diff = None
                for c in got.columns:
                    neq = got[c].ne(exp[c]) & ~(got[c].isna() & exp[c].isna())
                    if neq.any():
                        i = int(neq.idxmax())
                        diff = (c, i, got[c].iloc[i], exp[c].iloc[i])
                        break
                results[name] = f"VALUE-MISMATCH at col={diff[0]} row={diff[1]}: got={diff[2]!r} exp={diff[3]!r}"
            else:
                results[name] = f"OK ({len(got)} rows)"
    bad = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v.startswith(("OK", "rows-only")) else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"[{flag}] {k}: {v}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
