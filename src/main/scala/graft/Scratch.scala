package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; val t1 = System.nanoTime()
      println(f"[scratch] $label: ${(t1-t0)/1e9}%.2f s")
    }
    val docs = Tables.table(spark, sfDir, "documents")
    // warmup
    force(docs.select(count(lit(1))))

    val sh = docs.select(col("doc_id"), col("lang"), col("source"),
        explode(TextFns.wordShingles(col("text"), 3)).as("_s"))
      .select(col("doc_id"), col("lang"), col("source"), TextFns.hash64(col("_s")).as("sh"))
      .distinct()
    time("explode+hash+distinct")(force(sh))
    time("explode+hash only")(force(docs.select(col("doc_id"),
      explode(TextFns.wordShingles(col("text"), 3)).as("_s"))
      .select(TextFns.hash64(col("_s")).as("sh"))))
    time("explode only")(force(docs.select(col("doc_id"),
      explode(TextFns.wordShingles(col("text"), 3)).as("_s"))))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    time("sizes")(force(sizes))
    val a = sh.select(col("doc_id").as("doc_a"), col("lang"), col("source"), col("sh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("lang").as("b_lang"), col("source").as("b_source"), col("sh").as("b_sh"))
    val inter = a.join(b, col("lang") === col("b_lang") && col("source") === col("b_source")
        && col("sh") === col("b_sh") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    time("inter join")(force(inter))
    time("full q24")(force(SparkEntry.queries("q24_dedup_ngram_jaccard")(spark, sfDir)))
    spark.stop()
  }
}
