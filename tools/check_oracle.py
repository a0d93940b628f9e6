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


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = canon(got.fetchall(), got.columns)
            exp = con.sql(sql)
            ecols, erows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
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
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
