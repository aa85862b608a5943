#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
Assumes graft.Verify has already written <outDir>/<name>/ parquet dirs and
<outDir>/oracle_sql.json. Registers each <sfDir>/*.parquet as a DuckDB view
named after the table, runs each oracle SQL, and compares against the Spark
result: schema (column names, sorted), row count, and a hash over all values
with columns sorted by name and rows sorted by all columns.
"""
import glob
import hashlib
import json
import os
import sys

import duckdb


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def table_hash(df):
    h = hashlib.sha256()
    for _, row in df.iterrows():
        for v in row:
            h.update(repr(v).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        entry = {"rows_match": False, "schema_match": False, "hash_match": False}
        try:
            sdf = canon(con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            odf = canon(con, sql)
            entry["spark_rows"], entry["oracle_rows"] = len(sdf), len(odf)
            entry["rows_match"] = len(sdf) == len(odf)
            entry["schema_match"] = list(sdf.columns) == list(odf.columns)
            if not entry["schema_match"]:
                entry["spark_cols"], entry["oracle_cols"] = list(sdf.columns), list(odf.columns)
            entry["hash_match"] = (entry["rows_match"] and entry["schema_match"]
                                   and table_hash(sdf) == table_hash(odf))
            if entry["rows_match"] and entry["schema_match"] and not entry["hash_match"]:
                # locate first differing cell for debugging
                for i in range(len(sdf)):
                    for c in sdf.columns:
                        a, b = sdf.iloc[i][c], odf.iloc[i][c]
                        if repr(a) != repr(b):
                            entry["first_diff"] = {"row": i, "col": c,
                                                   "spark": repr(a), "oracle": repr(b)}
                            break
                    if "first_diff" in entry:
                        break
        except Exception as e:
            entry["error"] = str(e)[:500]
        results[name] = entry
        ok = all(entry.get(k) for k in ("rows_match", "schema_match", "hash_match"))
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else f"  {entry}"))
    n_ok = sum(1 for e in results.values()
               if e.get("rows_match") and e.get("schema_match") and e.get("hash_match"))
    print(f"== {n_ok}/{len(results)} green")
    with open(os.path.join(out_dir, "local_correctness.json"), "w") as f:
        json.dump(results, f, indent=1, default=str)
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
