package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, the single latest right row with
  * `rightTs <= leftTs` in the same key group — the time-series lookup
  * (quotes-to-trades, sensor-state-at-event) that plain equi-joins can't
  * express without a quadratic candidate pairing.
  *
  * Distributed shape: tag both inputs, UNION them, and run ONE window sort
  * per key ordered by (ts, side, tiebreak) with `last(value, ignoreNulls)`
  * carrying the right side forward — right rows sort BEFORE left rows at
  * equal timestamps, so "at or before" includes ties. One shuffle + one
  * partition-local sort over |L| + |R| rows; never a per-pair join. The
  * matched row is deterministic under timestamp ties: the right row with
  * the greatest (ts, tiebreak).
  */
object AsOf {

  /** @param left      query rows (keyCols, leftTs, carried columns)
    * @param right     state rows (keyCols, rightTs, tiebreakCol, payload)
    * @param keyCols   equality keys
    * @param leftTs    left timestamp column name (any orderable numeric/ts)
    * @param rightTs   right timestamp column name
    * @param tiebreak  right-side column ordering rows within one timestamp
    * @param payload   right-side columns to attach to each left row
    * @param direction "backward" (latest right at-or-before, ties → the
    *                  GREATEST tiebreak) or "forward" (earliest right
    *                  at-or-after, ties → the SMALLEST tiebreak — the
    *                  next-scheduled-event lookup). Forward runs the same
    *                  single union+window machinery with the sort
    *                  reversed; cost is identical.
    * @param maxDelta  optional staleness/lookahead horizon: a match
    *                  farther than this from `leftTs` (numeric delta, or
    *                  an INTERVAL expression for timestamp columns)
    *                  reports as no-match (nulls) — "state older than 7
    *                  days is no state". Nulling the nearest match ≡
    *                  restricting candidates to the horizon, because the
    *                  match is the extreme row: every other candidate is
    *                  farther from `leftTs` on the same side.
    * Output: all left columns + `asof_<rightTs>`, `asof_<tiebreak>`, and
    * `asof_<c>` for each payload column (null when no right row matches).
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String, tiebreak: String,
           payload: Seq[String], direction: String = "backward",
           maxDelta: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward: $direction")
    val carried = Seq(rightTs, tiebreak) ++ payload
    // left passthrough columns: everything except the keys and the left
    // timestamp (which travels as the shared sort column `_ts`)
    val leftCols = left.columns.toSeq.filterNot(_ == leftTs)
    // The right side travels as ONE nullable struct, null for left rows:
    // last(_r, ignoreNulls) then selects the whole matched row ATOMICALLY.
    // Per-column lasts would mix values from different rows whenever a
    // payload field is null (the null would be skipped back to an older
    // row while ts/tiebreak report the newer one).
    //
    // Null right timestamps are excluded up front — "at or before" is
    // undefined for them (the SQL pairing r.ts <= l.ts excludes them too),
    // and under NULLS FIRST ordering they would otherwise leak phantom
    // matches into left rows with no preceding state.
    val taggedRight = right.filter(col(rightTs).isNotNull).select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_side")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(c)) :+
        struct(carried.map(col): _*).as("_r"): _*)
    val rStructType = taggedRight.schema("_r").dataType
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_side")) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(rStructType).as("_r"): _*)
    // forward = backward on reversed time: ts desc walks from the future,
    // so `last` carries the EARLIEST following right row; _side stays asc
    // (right before left at equal ts → ties match in both directions);
    // tiebreak desc makes the carried row the smallest-tiebreak one
    val (tsOrd, tbOrd) =
      if (direction == "backward")
        (col("_ts").asc, col("_r")(tiebreak).asc)
      else (col("_ts").desc, col("_r")(tiebreak).desc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrd, col("_side").asc, tbOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("_r"), ignoreNulls = true).over(w)
    val carriedCols = carried.map(c => matched(c).as(s"asof_$c"))
    val res = taggedRight.unionByName(taggedLeft)
      .select((keyCols.map(col) ++ Seq(col("_ts"), col("_side")) ++
        leftCols.filterNot(keyCols.contains).map(col)) ++ carriedCols: _*)
      .filter(col("_side") === 1)
      .drop("_side")
      .withColumnRenamed("_ts", leftTs)
    maxDelta.fold(res) { d =>
      // materialize the horizon test BEFORE nulling anything — nulling
      // asof_<rightTs> first would null the predicate itself for the
      // remaining carried columns
      val tooFar =
        if (direction == "backward")
          col(s"asof_$rightTs") < col(leftTs) - d
        else col(s"asof_$rightTs") > col(leftTs) + d
      val flagged = res.withColumn("_toofar", coalesce(tooFar, lit(false)))
      carried.foldLeft(flagged)((acc, c) => acc.withColumn(s"asof_$c",
        when(col("_toofar"), lit(null)).otherwise(col(s"asof_$c"))))
        .drop("_toofar")
    }
  }
}
