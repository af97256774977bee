package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) versioning: turn an update log into
  * effective-dated history rows — the audit-history twin of the ledger's
  * no-override merge (the ledger keeps the FIRST value forever; an SCD2
  * view keeps EVERY value with its validity interval, which is what a
  * training-data pipeline needs to answer "which device mapping / quality
  * threshold / mixture weight was in force when shard X was built").
  *
  * Shape: one shuffle on the key columns; the change-collapse lag and the
  * validity lead run over the same partitioning, so Catalyst reuses the
  * exchange (and the sort) rather than shuffling twice.
  */
object Scd {

  /** Collapse an update log to SCD2 history.
    *
    *  - `keyCols`: the dimension identity (one history per key).
    *  - `orderCols`: event-time column FIRST, then tiebreak columns that
    *    make the ordering total (two updates at one timestamp would
    *    otherwise version nondeterministically).
    *  - `trackedCols`: attribute columns whose changes open a new version;
    *    consecutive updates with identical tracked values collapse into
    *    the earlier version (the defining SCD2 property). Comparison is
    *    null-safe: null → value and value → null both open versions.
    *
    * Output: keyCols ++ trackedCols ++ (valid_from = the opening update's
    * event-time value, valid_to = the NEXT version's valid_from or null,
    * is_current). Half-open intervals: a version is in force for
    * [valid_from, valid_to).
    */
  def scd2(updates: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
           trackedCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && trackedCols.nonEmpty,
      "keyCols, orderCols and trackedCols must be non-empty")
    val outCols = Seq("valid_from", "valid_to", "is_current")
    (outCols :+ "__opens").foreach(c => require(!updates.columns.contains(c),
      s"column '$c' is reserved by scd2 but exists on the input"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // a row opens a version iff any tracked attribute differs (null-safely)
    // from the previous update of the same key
    val changed: Column = trackedCols
      .map(c => !(lag(col(c), 1).over(w) <=> col(c)))
      .reduce(_ || _) || row_number().over(w) === 1
    val openings = updates
      .withColumn("__opens", changed)
      .filter(col("__opens"))
      .drop("__opens")
    val ts = orderCols.head
    openings
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ trackedCols ++ outCols).map(col): _*)
  }
}
