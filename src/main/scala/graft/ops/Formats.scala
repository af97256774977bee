package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Interchange-format seams beyond parquet — the ingest/egress surface a
  * corpus pipeline actually meets in the wild: columnar ORC for
  * warehouse-side exchange, and line-delimited JSON (the de-facto raw
  * format of web-crawl corpus dumps) read defensively, with malformed
  * lines QUARANTINED instead of failing the task — the same
  * corrupt-bytes contract as the multimodal decoders ([[Multimodal]]):
  * at 100 TB there is always a bad record, and one of them must never
  * kill a 1000-executor stage.
  *
  * Both ops round-trip through real Spark sources (`orc(...)`,
  * `json(...)` with PERMISSIVE + columnNameOfCorruptRecord), so the
  * gates prove the actual source machinery — schema application,
  * partition discovery/pruning, corrupt-record routing — not a
  * simulation of it.
  */
object Formats {

  /** Write `df` as ORC partitioned by `partitionCol`, read it back.
    * Partition values are directory-encoded on write and re-discovered
    * on read, so the partition column comes back LAST in the schema and
    * (with type inference on) may change type for numeric-looking
    * values — callers select columns explicitly. Reading with a
    * partition-column filter prunes directories before any ORC byte is
    * touched (pinned by FormatsSpec's explain check, the posture that
    * matters when the partition count is large).
    */
  def orcRoundTrip(df: DataFrame, path: String,
                   partitionCol: String): DataFrame = {
    df.write.mode("overwrite").partitionBy(partitionCol).orc(path)
    df.sparkSession.read.orc(path)
  }

  /** Write the single string column `lineCol` as raw text (one line per
    * row — JSONL when the lines are JSON), then read it back through
    * Spark's JSON source in PERMISSIVE mode with `schema`: well-formed
    * lines parse into the schema columns, malformed ones surface as a
    * row with all schema columns NULL and the raw line preserved in
    * `corruptCol` — quarantined WITH evidence, never a task failure and
    * never silently dropped. (Spark refuses a query that references
    * ONLY the corrupt column; the gates aggregate it alongside parsed
    * columns, which is also the honest shape — quarantine counts belong
    * next to the good-row stats they were separated from.)
    */
  def jsonlQuarantineRead(lines: DataFrame, path: String,
                          schema: StructType, lineCol: String = "line",
                          corruptCol: String = "_corrupt_record"): DataFrame = {
    lines.select(col(lineCol)).write.mode("overwrite").text(path)
    val full = StructType(schema.fields :+
      StructField(corruptCol, StringType, nullable = true))
    lines.sparkSession.read
      .schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }
}
