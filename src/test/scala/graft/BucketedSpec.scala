package graft

import org.apache.spark.sql.functions._

import graft.ops.Bucketed

/** Pins the co-located-join property: once both sides are persisted
  * bucketed+sorted on the join key, the join plans with ZERO exchanges
  * and zero sorts — the shuffle moved to write time and amortizes over
  * every later join.
  */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("co-located bucketed join: zero Exchange, zero Sort, right rows") {
    val facts = (0L until 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val dims = (0L until 1000L by 2).map(i => (i, i * 10)).toDF("doc_id", "score")
    Bucketed.coLocate(facts, "b_facts", "doc_id", buckets = 4)
    Bucketed.coLocate(dims, "b_dims", "doc_id", buckets = 4)

    // forbid the broadcast fallback so the test proves BUCKET alignment,
    // not broadcast shuffle-avoidance (restore after)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.joinCoLocated(spark, "b_facts", "b_dims", "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed sides must join without any exchange:\n$plan")
      assert(joined.count() == 500)
      // equivalence with the plain (shuffling) join
      val plain = facts.join(dims, Seq("doc_id"))
      assert(joined.except(plain).count() == 0 &&
        plain.except(joined).count() == 0)

      // by default Spark re-sorts inside each bucket (it won't trust
      // write-time order across multiple files per bucket); with one file
      // per bucket — which coLocate guarantees — the legacy flag lets the
      // planner consume the write-time sort and the Sort nodes vanish too
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val sortless = Bucketed.joinCoLocated(spark, "b_facts", "b_dims", "doc_id")
        .queryExecution.executedPlan.toString
      assert(!sortless.contains("Exchange"), s"still no exchange:\n$sortless")
      assert(!sortless.contains("Sort ["), // node prints as `Sort [key ...`
        s"with trusted write-time order, no sort node expected:\n$sortless")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("coLocate writes one file per bucket (repartition aligned)") {
    val df = (0L until 100L).map(i => (i, i.toString)).toDF("doc_id", "v")
    try {
      Bucketed.coLocate(df, "b_files", "doc_id", buckets = 3)
      val loc = spark.sql("DESCRIBE TABLE EXTENDED b_files")
        .filter(col("col_name") === "Location")
        .select("data_type").as[String].head()
      val dir = new java.io.File(new java.net.URI(loc))
      val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 3,
        s"expected 3 bucket files, got ${parts.map(_.getName).mkString(", ")}")
    } finally spark.sql("DROP TABLE IF EXISTS b_files")
  }
}
