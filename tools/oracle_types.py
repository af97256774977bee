#!/usr/bin/env python3
"""Oracle result-dtype lint — catches the q242 class before the driver does.

The driver's correctness hash is TYPE-SENSITIVE on the DuckDB side: an
oracle whose values match Spark's exactly still fails if a result column
materializes as a dtype pandas normalizes differently from Spark's
(round 12: one uncast `sum(CASE ...)` -> HUGEINT/int128 cost the round
its 246/246 while every value matched). This lint DESCRIBEs every oracle
SQL and fails loudly on any result column outside the canonical set the
driver round-trips faithfully:

  BIGINT, DOUBLE, VARCHAR, BOOLEAN, DATE, TIMESTAMP (+ LISTs thereof).

Flagged classes and why:
  HUGEINT / DECIMAL  -> pandas object/float, hash diverges from int64
  TINYINT/SMALLINT/INTEGER/UTINYINT/... -> one driver dtype-normalization
                        change away from the same failure; cast to BIGINT
  FLOAT              -> 32-bit, Spark emits 64-bit doubles
  TIMESTAMP WITH TIME ZONE / TIME / INTERVAL / BLOB -> never intended

Usage: python3 tools/oracle_types.py <sfDir> <oracle_sql.json>
Exit 1 if any oracle has a non-canonical output column.
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

CANONICAL = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}


def canonical(duck_type: str) -> bool:
    t = duck_type.strip().upper()
    # LIST of a canonical element type is fine (array columns round-trip)
    m = re.fullmatch(r"(.+)\[\]", t)
    if m:
        return canonical(m.group(1))
    return t in CANONICAL


def main(sf_dir: str, oracle_json: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_json))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as ex:
            print(f"LINT-ERR {name}: describe failed: {str(ex).splitlines()[0]}")
            n_bad += 1
            continue
        bad = [(c, t) for c, t, *_ in desc if not canonical(t)]
        if bad:
            n_bad += 1
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"LINT-FAIL {name}: non-canonical oracle column(s) {cols}"
                  f" — CAST to BIGINT/DOUBLE/VARCHAR in the oracle SQL")
    print(f"== oracle type lint: {len(oracle)} oracles, {n_bad} flagged")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
