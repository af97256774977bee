package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * $SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Forcing: `.write.format("noop")` executes the FULL plan including every
  * projected column — a bare `.count()` would let Catalyst prune the
  * expensive expressions and under-measure. A warmup query first absorbs
  * JVM/codegen JIT so per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // extra confs for experiments (e.g. the AQE skew-join pass in
    // SCALING.md): SPARK_GRAFT_CONF="k=v;k=v". Driver never sets it.
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains('='))
      .foreach { kv =>
        // trim around '=' too: "k = v" must set k, not the silent no-op
        // key "k " (Spark stores unknown keys verbatim)
        val Array(k, v) = kv.split("=", 2).map(_.trim)
        if (k.nonEmpty) builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: exercise scan+shuffle+codegen paths once
    try force(SparkEntry.queries("q12_tpch_q1")(spark, sfDir))
    catch { case _: Throwable => () }

    // optional comma-separated substring filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=q21,q24 — the driver never sets it (full run).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.contains))
    }

    // Fixed per-query overhead floor: a do-nothing 32-task job through the
    // same noop-write forcing path (job submit, task launch, commit — no
    // compute, no shuffle). Reported so ratio readers can subtract the
    // floor Spark pays per query that an embedded engine doesn't; at sf0.1
    // most sub-second gates are mostly floor. min-of-3 = the steady floor.
    val overhead = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      force(spark.range(0, cpus.toLong * 1000, 1, cpus.toInt).toDF("i"))
      (System.nanoTime() - t0) / 1e9
    }.min

    // min of 2 runs: the steady-state cost, damping GC/JIT/compile noise.
    // A failed run is recorded as -1 (never a fake fast timing) so the JSON
    // cannot mask a broken query inside a healthy-looking total.
    //
    // PER-QUERY ISOLATION (round-11): in a 240-query sequential JVM the
    // tail queries read 2-8x their isolated time (judge-verified: q95
    // 6.38 s in-suite vs 0.82 s isolated) — heap pressure from earlier
    // queries' cached blocks and codegen classes, not plan drift. So
    // each query starts from a clean slate: drop the accumulated catalog
    // cache and run a full GC OUTSIDE the timed section. Each query now
    // pays for its own persists (that's the honest number — the old
    // carry-over note measured 186 -> 204 s total, a price worth the
    // within-1.5x-of-isolated published figures). Opt out for quick
    // local iteration with SPARK_GRAFT_NO_BREATHER=1.
    val breather = !sys.env.contains("SPARK_GRAFT_NO_BREATHER")
    TempDirs.sweepStale() // r15 draw2: 472 leftover graft-* dirs in /tmp
                          // distorted q113 3.5x — clean before, and between
    val results = selected.map { case (name, fn) =>
      // previous query's scratch dirs (each timed run re-invokes the lambda
      // and creates fresh ones) — swept OUTSIDE the timed section
      TempDirs.sweep()
      if (breather) {
        spark.catalog.clearCache()
        System.gc()
      }
      val times = (1 to 2).map { _ =>
        // min-of-2 still legitimately reuses run 1's persists WITHIN the
        // query — that is the query's own steady state.
        val t0 = System.nanoTime()
        try { force(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    TempDirs.sweep() // last query's scratch dirs
    // ms precision: full double repr once overflowed the driver's line
    // capture and truncated the first (alphabetically: q01) entry
    def r3(v: Double): String =
      if (v < 0) "-1" else (math.round(v * 1000) / 1000.0).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val fullLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","failed":$failed,"overhead_s":${r3(overhead)},"queries":$qs,"sf":"$sfDir"}"""
    println(fullLine)
    // The full line above is ~8 KB at 240 queries and the round driver
    // captures only a ~2 KB stdout TAIL — every BENCH_r*.json through r10
    // shipped "parsed": null because the line was cut mid-JSON. So:
    // (a) persist the full line to a file for tools/bench_oracle.py, and
    // (b) end stdout with a COMPACT summary line (aggregates only — no
    // per-query keys, so bench_oracle's `"qNN":sec` scan can't double-
    // match) that fits whole inside any sane tail window.
    // subset runs (SPARK_GRAFT_ONLY) must not clobber the full-suite
    // artifact of record — they land in BENCH_SUBSET.json instead
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "BENCH_SUBSET.json" else "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","failed":$failed,"overhead_s":${r3(overhead)},"n_queries":${results.size},"queries_file":"$outPath","sf":"$sfDir"}""")
    // r16 verdict item 2: the driver keeps only a small stdout TAIL, so the
    // ~8 KB full line above never parses ("parsed": null since ~r10). Emit
    // the per-query map AGAIN as the FINAL stdout lines in <= 2 KB chunks —
    // each line a complete JSON object — so any tail window ends with whole
    // objects a parser can use. Additions-only: the contract line and the
    // compact summary above are unchanged.
    val entries = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
    val chunks = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer[String]())
    var len = 0
    entries.foreach { e =>
      if (len + e.length > 1800) {
        chunks += scala.collection.mutable.ArrayBuffer[String](); len = 0
      }
      chunks.last += e; len += e.length + 1
    }
    val nParts = chunks.size
    chunks.zipWithIndex.foreach { case (c, i) =>
      println(s"""{"metric":"queries_part","part":${i + 1},"n_parts":$nParts,"sf":"$sfDir","queries":${c.mkString("{", ",", "}")}}""")
    }
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","failed":$failed,"overhead_s":${r3(overhead)},"n_queries":${results.size},"n_parts":$nParts,"queries_file":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
