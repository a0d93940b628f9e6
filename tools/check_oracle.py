#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB with the sfDir parquet tables
registered as views, and compares row counts, sorted column names, and
sorted row values. Dev-only tool; the library itself never uses Python.
"""
import json
import math
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon(rows, cols):
    """Sort columns by name, then rows; stringify floats with rounding."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)  # full round-trip precision: bit-exact compare
        return repr(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def kind(t):
    """Collapse a DuckDB type to the rendering class the driver's
    arrow/pandas fetch uses: HUGEINT and DECIMAL render differently from
    BIGINT/DOUBLE (8.0 vs 8), so a kind mismatch = driver hash mismatch
    even when fetchall() values look identical."""
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s == "HUGEINT":
        return "hugeint"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    return s


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    import os
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            # subset Verify run (dev-only 3-arg form) — not a failure
            n_skip += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = canon(got.fetchall(), got.columns)
            gtypes = dict(zip(got.columns, got.types))
            exp = con.sql(sql)
            ecols, erows = canon(exp.fetchall(), exp.columns)
            etypes = dict(zip(exp.columns, exp.types))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        bad_types = [
            (c, gtypes[c], etypes[c]) for c in gcols
            if c in etypes and kind(gtypes[c]) != kind(etypes[c])]
        if bad_types:
            c, gt, et = bad_types[0]
            print(f"FAIL {name}: type mismatch on '{c}': spark parquet "
                  f"{gt} vs duckdb {et} (add a CAST in the oracle SQL)")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
        elif len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
        elif grows != erows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, erows))
                       if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:\n"
                  f"  spark:  {grows[bad]}\n  duckdb: {erows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    skipped = f", {n_skip} not dumped (subset run)" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
