package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical readers for the driver-provided parquet testdata
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * Scale notes (100 TB posture): every reader returns a plain parquet scan so
  * Catalyst keeps predicate pushdown / column pruning / partition pruning.
  * Nothing here collects or caches on the driver.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4
    * rejects ([PARQUET_TYPE_ILLEGAL]) unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` maps it to LongType.
    * We set that (runtime-settable SQLConf) and convert to a micros-precision
    * TimestampType with exact integer division (`div`, not `/`, because nanos
    * since epoch exceed 2^53 and double division would lose precision).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long source
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw // already a timestamp (e.g. a ScaleUp replica)
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Session factory used by mains and tests: UTC (oracle parity), shuffle
    * partitions sized to local cores (not the 200 default), AQE on.
    */
  def session(appName: String, cores: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // SPARK_GRAFT_STATE_STORE=rocksdb — the 100 TB posture for unbounded
    // streaming state (see graft.streaming.StateStores for the trade-off)
    sys.env.get("SPARK_GRAFT_STATE_STORE")
      .foreach(graft.streaming.StateStores.configure(spark, _))
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
