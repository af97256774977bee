#!/usr/bin/env python3
"""Time the DuckDB oracle per query and emit the per-query Spark/DuckDB
ratio — the automated form of the round-4 judge's hand measurement.

Usage:
    python3 tools/bench_oracle.py <sfDir> <verifyOutDir> <benchJson> [out]
        [streamBenchJson]

- <sfDir>:        parquet tables dir (e.g. /root/testdata/sf0.1)
- <verifyOutDir>: a graft.Verify dump — only oracle_sql.json is read
- <benchJson>:    file containing the graft.Bench JSON line (or a driver
                  BENCH_r*.json whose "tail" embeds it); spark_s per query
- [out]:          output path (default ORACLE_BENCH.json)
- [streamBenchJson]: a graft.tools.StreamBench JSON line; when given, the
                  four streaming gates gain `spark_steady_s` (the warm
                  second-AvailableNow-trigger drain against an existing
                  checkpoint) and `ratio_steady`. The raw `ratio` for
                  those gates compares a COLD checkpointed-stream start
                  against a batch DuckDB replay — a measurement artifact
                  (engine startup, not per-row cost) that the steady
                  number corrects.

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

from oracle_types import TABLES

# gate -> StreamBench shape key (timings are per provider: hdfs/rocksdb;
# steady-state = the default hdfs provider's warm drain)
STREAMING_GATES = {
    "q33_streaming_ingest": "ingest_dedup",
    "q56_streaming_day_window": "day_window",
    "q75_streaming_curation": "curation",
    "q113_streaming_stream_join": "stream_join",
    "q129_streaming_append_window": "append_window",
    "q130_streaming_closed_sessions": "closed_sessions",
    "q134_streaming_ledger_sink": "ledger_sink",
    "q157_streaming_enrich": "enrich",
    # RocksDB-only shape (transformWithState requires that provider)
    "q166_tws_closed_sessions": "tws_sessions",
    "q174_streaming_dedup_watermark": "dedup_watermark",
    "q244_streaming_drift_monitor": "drift_monitor",
    "q248_streaming_index_admission": "index_admission",
    "q257_tws_capped_sessions": "capped_sessions",
    # stateless foreachBatch against a frozen/growing census (q267's warm
    # drain is the shared shape; q271 adds the between-drain census merge)
    "q267_streaming_census_admission": "census_admission",
    "q271_streaming_census_growth": "census_admission",
    # stateless foreachBatch against a frozen codebook + keep-set index
    "q278_streaming_semdedup_admission": "sem_admission",
    # stateless foreachBatch against two frozen censuses (target + source)
    "q283_streaming_dsir_admission": "dsir_admission",
    # stateless foreachBatch against a frozen gram-hash index
    "q285_streaming_substring_screen": "substring_screen",
}

# Gates whose oracle PREDICTS the synthesized round-trip arithmetically
# (SELECT over doc_id math) while the Spark side does the actual media
# work (build payloads, walk containers, encode/decode frames). The ratio
# is answer-vs-answer, not work-vs-work — DuckDB never touches a byte of
# media. Kept out of the headline batch ratio alongside streaming gates.
ROUNDTRIP_GATES = {
    "q122_video_frame_decode": "builds AVIs of real JPEG frames and "
        "ImageIO-decodes every frame; the oracle only predicts the "
        "expected geometry arithmetically",
    "q123_image_resize": "encodes, bilinear-resamples, re-encodes and "
        "re-decodes real PNGs; the oracle only predicts geometry and the "
        "round-tripped color arithmetically",
    "q204_approx_quantile_audit": "runs the GK sketch plus an exact "
        "rank-verification pass; the oracle only asserts the expected "
        "contract booleans via VALUES — it never computes a quantile",
    "q141_image_dhash_neardup": "synthesizes, PNG-encodes and "
        "ImageIO-decodes a real image per doc before hashing; the oracle "
        "predicts the lossless round-tripped pixels arithmetically",
    "q193_video_scene_cuts": "decodes every MJPEG frame of every "
        "synthesized AVI before differencing; the oracle predicts the "
        "cuts from the frame-class rule without touching a byte",
    "q197_wav_trim_silence": "PCM-decodes, trims, RE-ENCODES and "
        "re-parses real WAVs; the oracle predicts the surviving frame "
        "arithmetic only",
    "q207_orc_roundtrip": "writes the corpus to partitioned ORC and "
        "re-reads it through partition discovery; the oracle aggregates "
        "the parquet original without any write",
    "q208_jsonl_quarantine": "serializes, corrupts, writes and "
        "PERMISSIVE-parses real JSONL files; the oracle predicts the "
        "quarantine split from the corruption rule without any I/O",
    "q214_avro_roundtrip": "writes the corpus to Avro OCF containers and "
        "streaming-decodes them back; the oracle aggregates the parquet "
        "original without any write",
}


def stream_steady(path: str) -> dict:
    """shape -> warm seconds from a StreamBench line: the default (hdfs)
    provider, falling back to rocksdb for shapes that only run there
    (transformWithState requires the RocksDB provider)."""
    raw = open(path).read()
    out = {}
    for prov in ("rocksdb", "hdfs"):  # hdfs second -> wins when present
        for k, v in re.findall(
                rf'"([a-z_]+)/{prov}/warm"\s*:\s*(-?[0-9.]+)', raw):
            out[k] = float(v)
    return out


def spark_times(path: str) -> dict:
    raw = open(path).read()
    # accept either the bare Bench line or a driver BENCH_r*.json capture
    # whose "tail" embeds it with escaped quotes
    pairs = re.findall(r'(?:\\"|")(q\d{2}[a-z_0-9]*)(?:\\"|")\s*:\s*(-?[0-9.]+)', raw)
    if not pairs:
        raise SystemExit(f"no per-query timings found in {path}")
    return {k: float(v) for k, v in pairs}


def spark_overhead(path: str):
    """Bench's measured do-nothing-job floor (overhead_s), if present."""
    m = re.search(r'(?:\\"|")overhead_s(?:\\"|")\s*:\s*(-?[0-9.]+)',
                  open(path).read())
    return float(m.group(1)) if m else None


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    sf_dir, verify_dir, bench_json = sys.argv[1:4]
    out_path = sys.argv[4] if len(sys.argv) > 4 else "ORACLE_BENCH.json"
    steady = stream_steady(sys.argv[5]) if len(sys.argv) > 5 else {}

    oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
    spark = spark_times(bench_json)
    overhead = spark_overhead(bench_json)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet*', hive_partitioning=0)")
    con.execute("SELECT count(*) FROM lineitem").fetchall()  # warm FS cache

    # ambient-drift sentinel (r14 verdict task 7): a fixed subset of
    # gates that never change round to round, timed FIRST (before the
    # main sweep can heat caches differently per round) and reported in
    # the summary. r14's isolated draws ran a uniform ~1.15x above r13's
    # on unchanged gates — same-machine drift that per-gate deltas can't
    # be read through without a baseline. Next round: divide per-gate
    # deltas by (sentinel_now / sentinel_prev) before calling a
    # regression structural.
    SENTINELS = ("q01_filter_project", "q12_tpch_q1", "q47_edit_distance")
    sentinel = {}
    for name in SENTINELS:
        if name not in oracle:
            continue
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            sentinel[name] = {"duckdb_s": round(time.time() - t0, 3),
                              "spark_s": spark.get(name)}
        except Exception:  # noqa: BLE001 - sentinel is best-effort
            pass

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
        # floor-adjusted ratio: Spark pays a fixed job-submit/task-launch
        # cost per query that an embedded engine doesn't; on sub-second
        # gates the raw ratio measures that floor, not the plan. Clamped
        # at 0 (a query can't be cheaper than the floor it includes).
        if ratio is not None and overhead is not None:
            entry["ratio_adjusted"] = round(
                max(spark_s - overhead, 0.0) / duck_s, 3)
        if name in ROUNDTRIP_GATES:
            entry["note"] = ("real work vs predicting oracle ("
                             + ROUNDTRIP_GATES[name] + ")")
        if name in STREAMING_GATES:
            entry["note"] = ("cold checkpointed-stream start vs batch "
                            "DuckDB replay"
                            + ("; see spark_steady_s"
                               if STREAMING_GATES[name] else ""))
            shape = STREAMING_GATES[name]
            warm = steady.get(shape) if shape else None
            if warm is not None:
                entry["spark_steady_s"] = warm
                entry["ratio_steady"] = (round(warm / duck_s, 3)
                                         if duck_s else None)
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
    # batch-only ratio: streaming gates compare a cold stream start to a
    # batch replay (apples-to-oranges); their steady-state cost is the
    # per-gate spark_steady_s field instead
    batch = [(k, v) for k, v in result.items()
             if k not in STREAMING_GATES and k not in ROUNDTRIP_GATES
             and v["duckdb_s"]
             and v["spark_s"] is not None and v["spark_s"] >= 0]
    if overhead is not None:
        summary["overhead_s"] = overhead
    import os
    # the artifact carries its own denominator caveat (r13 verdict task 6:
    # README alone held it): DuckDB's heaviest oracles are run-to-run
    # bimodal, so a single draw's ratio is one sample from an envelope.
    # This draw's values for the known-bimodal gates are quoted inline so
    # a reader can place the draw without the README; ORACLE_BENCH_NOTE
    # appends the round's measured multi-draw envelope.
    bimodal = {k: result[k]["duckdb_s"]
               for k in ("q18_pipeline_e2e", "q198_mmr_diverse_select")
               if k in result and result[k].get("duckdb_s")}
    note = ("DuckDB denominator is run-to-run bimodal on its heaviest "
            "oracles (q18 measured 133/350/565 s same-day at sf0.1): read "
            "ratio_total_batch as one draw from an envelope and quote "
            "multi-draw ranges, never a single value."
            + ("".join(f" This draw: {k}={v} s." for k, v in sorted(bimodal.items()))))
    if os.environ.get("ORACLE_BENCH_NOTE"):
        note += " " + os.environ["ORACLE_BENCH_NOTE"]
    summary["note"] = note
    if sentinel:
        summary["sentinel"] = sentinel
        sd = sum(v["duckdb_s"] for v in sentinel.values())
        ss = sum(v["spark_s"] for v in sentinel.values()
                 if v["spark_s"] is not None)
        summary["sentinel_duckdb_total_s"] = round(sd, 3)
        summary["sentinel_spark_total_s"] = round(ss, 3)
        summary["note"] += (" Sentinel gates (fixed subset, timed before "
                            "the sweep — normalize same-machine drift "
                            "against the previous round's values before "
                            "reading per-gate deltas as structural): "
                            + ", ".join(f"{k} duckdb={v['duckdb_s']}s"
                                        + (f" spark={v['spark_s']}s"
                                           if v["spark_s"] is not None
                                           else "")
                                        for k, v in sorted(sentinel.items())))
    if batch:
        bs = round(sum(v["spark_s"] for _, v in batch), 3)
        bd = round(sum(v["duckdb_s"] for _, v in batch), 3)
        summary["batch_spark_total_s"] = bs
        summary["batch_duckdb_total_s"] = bd
        summary["ratio_total_batch"] = round(bs / bd, 3) if bd else None
        if overhead is not None and bd:
            bsa = round(sum(max(v["spark_s"] - overhead, 0.0)
                            for _, v in batch), 3)
            summary["batch_spark_total_adj_s"] = bsa
            summary["ratio_total_batch_adjusted"] = round(bsa / bd, 3)
    payload = {"summary": summary, "queries": result}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(summary))
    # console highlight: real BATCH offenders only — noted gates (streaming
    # machinery / real-codec work vs predicting oracles) are excluded from
    # the batch ratio, so surfacing them here would only mislead
    batch_only = [v for v in both if not v.get("note")]
    worst = sorted(batch_only, key=lambda v: -(v["ratio"] or 0))[:5]
    for v in worst:
        name = next(k for k, vv in result.items() if vv is v)
        print(f"  slowest vs oracle: {name} ratio={v['ratio']}")


if __name__ == "__main__":
    main()
