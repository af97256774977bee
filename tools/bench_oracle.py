#!/usr/bin/env python3
"""Time the DuckDB oracle per query and emit the per-query Spark/DuckDB
ratio — the automated form of the round-4 judge's hand measurement.

Usage:
    python3 tools/bench_oracle.py <sfDir> <verifyOutDir> <benchJson> [out]

- <sfDir>:        parquet tables dir (e.g. /root/testdata/sf0.1)
- <verifyOutDir>: a graft.Verify dump — only oracle_sql.json is read
- <benchJson>:    file containing the graft.Bench JSON line (or a driver
                  BENCH_r*.json whose "tail" embeds it); spark_s per query
- [out]:          output path (default ORACLE_BENCH.json)

Each oracle query runs once after a warmup query (DuckDB keeps no
cross-query JIT state worth damping; the expensive queries dominate by
orders of magnitude, so single-shot noise is irrelevant to the ratio).
Queries present in only one side are reported with nulls.
"""
import json
import re
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def spark_times(path: str) -> dict:
    raw = open(path).read()
    # accept either the bare Bench line or a driver BENCH_r*.json capture
    # whose "tail" embeds it with escaped quotes
    pairs = re.findall(r'(?:\\"|")(q\d{2}[a-z_0-9]*)(?:\\"|")\s*:\s*(-?[0-9.]+)', raw)
    if not pairs:
        raise SystemExit(f"no per-query timings found in {path}")
    return {k: float(v) for k, v in pairs}


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    sf_dir, verify_dir, bench_json = sys.argv[1:4]
    out_path = sys.argv[4] if len(sys.argv) > 4 else "ORACLE_BENCH.json"

    oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
    spark = spark_times(bench_json)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet*', hive_partitioning=0)")
    con.execute("SELECT count(*) FROM lineitem").fetchall()  # warm FS cache

    result = {}
    for name in sorted(set(oracle) | set(spark)):
        duck_s = None
        err = None
        if name in oracle:
            t0 = time.time()
            try:
                con.execute(oracle[name]).fetchall()
                duck_s = round(time.time() - t0, 3)
            except Exception as e:  # noqa: BLE001 - record, keep going
                err = str(e)[:200]
        spark_s = spark.get(name)
        ratio = (round(spark_s / duck_s, 3)
                 if spark_s is not None and spark_s >= 0 and duck_s
                 else None)
        entry = {"spark_s": spark_s, "duckdb_s": duck_s, "ratio": ratio}
        if err:
            entry["err"] = err
        result[name] = entry

    both = [v for v in result.values()
            if v["duckdb_s"] and v["spark_s"] is not None and v["spark_s"] >= 0]
    summary = {
        "sf": sf_dir,
        "n_queries": len(both),
        "spark_total_s": round(sum(v["spark_s"] for v in both), 3),
        "duckdb_total_s": round(sum(v["duckdb_s"] for v in both), 3),
    }
    summary["ratio_total"] = (round(summary["spark_total_s"]
                                    / summary["duckdb_total_s"], 3)
                              if summary["duckdb_total_s"] else None)
    payload = {"summary": summary, "queries": result}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(summary))
    worst = sorted(both, key=lambda v: -(v["ratio"] or 0))[:5]
    for v in worst:
        name = next(k for k, vv in result.items() if vv is v)
        print(f"  slowest vs oracle: {name} ratio={v['ratio']}")


if __name__ == "__main__":
    main()
