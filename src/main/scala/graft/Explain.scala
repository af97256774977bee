package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan (and optionally
  * times) for the named queries. Usage:
  *   sbt "runMain graft.Explain q24 [q21 ...]"   (substring match)
  * Reads $SPARK_GRAFT_SF_DIR (default sf0.01 — plan shape, not timing).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.exists(n.contains) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
