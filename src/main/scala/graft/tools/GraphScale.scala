package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Graph

/** Dev utility: measure q216's common-neighbors operator in exact-drop vs
  * Horvitz–Thompson `hubSample` mode on a given testdata dir — the
  * SCALING.md evidence that the degree cap bounds wedge work on a graph
  * that actually HAS over-cap hubs (the 10× replica densifies the
  * co-purchase graph ~10×, pushing hot parts past the cap). Prints a
  * degree census (so the row can state whether the cap binds) and
  * min-of-2 noop-forced walls per mode. Usage:
  *   sbt "runMain graft.tools.GraphScale <sfDir> [maxDegree] [hubSample] [uncapped]"
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxDeg = if (args.length > 1) args(1).toInt else 10000
    val hub = if (args.length > 2) args(2).toInt else 1000
    val runUncapped = args.length > 3 && args(3) == "uncapped"
    val spark = Tables.session("graft-graphscale",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // q216's edge set, verbatim (Extensions.scala q216 lambda)
    val li = Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_quantity") >= 30)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
    val pairs = li.as("x").join(li.as("y"),
        col("x.k") === col("y.k") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
    // degree census over the distinct undirected edge set (what the cap cuts)
    val e = pairs.select(least(col("a"), col("b")).as("a"),
      greatest(col("a"), col("b")).as("b")).distinct()
    val deg = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val census = deg.agg(count(lit(1)).as("nodes"),
      max("deg").as("max_deg"),
      sum(when(col("deg") > maxDeg, 1L).otherwise(0L)).as("over_cap"),
      sum(col("deg") * col("deg")).as("sum_deg2")).head()
    println(s"[graphscale] dir=$sfDir nodes=${census.getLong(0)} " +
      s"max_deg=${census.getLong(1)} over_cap(maxDeg=$maxDeg)=" +
      s"${census.getLong(2)} sum_deg2=${census.getLong(3)}")
    def time(label: String)(mode: => DataFrame): Unit = {
      val walls = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        mode.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[graphscale] $label min2=${walls.min}%.2f s " +
        s"runs=${walls.map(w => f"$w%.2f").mkString(",")}")
    }
    time(s"exact(maxDegree=$maxDeg)")(Graph.commonNeighborPairs(
      pairs, minCommon = 2, topK = 100, maxDegree = maxDeg))
    time(s"hubSample(maxDegree=$maxDeg,s=$hub)")(Graph.commonNeighborPairs(
      pairs, minCommon = 2, topK = 100, maxDegree = maxDeg,
      hubSample = hub))
    if (runUncapped)
      time("uncapped(maxDegree=1<<20)")(Graph.commonNeighborPairs(
        pairs, minCommon = 2, topK = 100, maxDegree = 1 << 20))
    spark.stop()
  }
}
