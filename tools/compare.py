#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, sorts
columns by name + rows, and compares values exactly (floats bit-for-bit).

Also runs the oracle result-TYPE lint (tools/oracle_types.py) over every
oracle in oracle_sql.json — the value compare below goes through pandas,
which erases DuckDB result dtypes, so a HUGEINT/TINYINT oracle column can
pass here yet fail the driver's type-sensitive hash (round-12 q242). A
lint hit counts as a FAIL even when the values match.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds
import pandas as pd

# canonical table list lives in oracle_types (compare.py already imports
# it for the dtype lint); one copy means a new base table can't be added
# to one tool and silently break the other
from oracle_types import TABLES


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values to python objects for comparison
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if hasattr(v, "item"):
            try:
                v = v.item()
            except Exception:
                pass
        if isinstance(v, bytes):
            return v.hex()
        if hasattr(v, "tolist"):  # numpy arrays / lists
            return tuple(v.tolist())
        if isinstance(v, list):
            return tuple(v)
        return v
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return df.columns.tolist(), rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    import os
    for name, sql in sorted(oracle.items()):
        # a filtered dev dump (Verify's prefix arg) writes only some dirs;
        # absent names were not run, not failed
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            got = ds.dataset(f"{out_dir}/{name}").to_table().to_pandas()
        except Exception as ex:
            print(f"FAIL {name}: spark result unreadable: {ex}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle sql error: {str(ex).splitlines()[0]}")
            n_fail += 1
            continue
        gc, gr = norm(got)
        ec, er = norm(exp)
        if [c.lower() for c in gc] != [c.lower() for c in ec]:
            print(f"FAIL {name}: columns differ spark={gc} duck={ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount spark={len(gr)} duck={len(er)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff at sorted-row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    skip = f" / {n_skip} not dumped" if n_skip else ""
    print(f"== {n_pass} pass / {n_fail} fail{skip}")
    # dtype lint over ALL oracles (even ones not dumped this run): the
    # pandas value-compare above is type-blind, the driver's hash is not.
    import oracle_types
    lint = oracle_types.main(sf_dir, f"{out_dir}/oracle_sql.json")
    return 1 if (n_fail or lint) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
