package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot comparison — the audit half of table versioning: given two
  * keyed versions of a relation, classify every key and name the columns
  * that moved. (The ledger keeps history by merge; this answers "what
  * CHANGED between two published states" — schema drift reviews, upstream
  * re-delivery audits, regression triage on curated corpora.)
  *
  * Scale shape: ONE full-outer shuffle join on the key; all column
  * comparison is row-local null-safe equality after the join, inside
  * whole-stage codegen. No collect, no per-column rescans — adding a
  * compared column adds a projection expression, not a pass.
  */
object Diff {

  /** Classify every key across two versions.
    *
    * Output: keyCols*, `status` ('added' | 'removed' | 'changed' |
    * 'unchanged'), `changed_cols` (comma-joined compareCols that differ,
    * in caller order; '' unless status = 'changed'). Null-safe: a column
    * moving null→value or value→null counts as changed; two nulls match.
    * Keys must be non-null and unique per version (the usual
    * published-snapshot contract) — duplicate keys would cross-multiply
    * in the join, and a null key never equi-matches, so presence is
    * detected through the key's own nullness after the outer join.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val old = v1.select((keyCols ++ compareCols).map(col): _*)
      .toDF(keyCols.map("k1_" + _) ++ compareCols.map("old_" + _): _*)
    val neu = v2.select((keyCols ++ compareCols).map(col): _*)
      .toDF(keyCols.map("k2_" + _) ++ compareCols.map("new_" + _): _*)
    val joinCond = keyCols.map(k => col("k1_" + k) === col("k2_" + k))
      .reduce(_ && _)
    val j = old.join(neu, joinCond, "full_outer")
    val inV1 = col("k1_" + keyCols.head).isNotNull
    val inV2 = col("k2_" + keyCols.head).isNotNull
    val allEqual = compareCols
      .map(c => col("old_" + c) <=> col("new_" + c)).reduce(_ && _)
    val status = when(!inV1, lit("added"))
      .when(!inV2, lit("removed"))
      .when(allEqual, lit("unchanged"))
      .otherwise(lit("changed"))
    // concat_ws skips nulls, so each unchanged column contributes nothing
    val changedCols = when(inV1 && inV2,
      concat_ws(",", compareCols.map(c =>
        when(!(col("old_" + c) <=> col("new_" + c)), lit(c))): _*))
      .otherwise(lit(""))
    val keys = keyCols.map(k =>
      coalesce(col("k1_" + k), col("k2_" + k)).as(k))
    j.select(keys ++ Seq(status.as("status"),
      changedCols.as("changed_cols")): _*)
  }

  /** CDC merge — the apply half to [[snapshotDiff]]'s audit half: fold a
    * change feed (insert/update/delete rows with a per-key sequence) into
    * a keyed base snapshot and produce the next snapshot. The lakehouse
    * MERGE INTO, expressed engine-neutrally.
    *
    * Semantics: per key, the change with the HIGHEST seq wins (earlier
    * changes to the same key are superseded, not replayed); a winning
    * 'D' removes the key, any other op upserts the change's payload;
    * keys untouched by the feed pass through from base. Base keys must
    * be unique and non-null (snapshot contract); (key, seq) must be
    * unique in the feed — two changes to one key at the same seq have no
    * defined winner, so the op rejects ties at runtime via an id-free
    * row_number over (seq DESC) pinned by requiring max-seq uniqueness
    * upstream (documented caller contract).
    *
    * Scale shape: ONE window over the feed keyed by the change key (the
    * feed is delta-sized, ≪ base), then ONE full-outer shuffle join
    * base-to-winners on the key; all op/coalesce logic is row-local
    * codegen after the join. For hash-bucketed published snapshots the
    * bucketed-ledger merge (`ledger.Ledger.merge`) is the
    * partition-pruned sibling — this is the format-agnostic relational
    * form.
    *
    * Output: keyCols ++ payloadCols — the merged snapshot.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   payloadCols: Seq[String], opCol: String = "op",
                   seqCol: String = "seq"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    // a tie AT THE MAX seq has no defined winner — enforced, not assumed:
    // in seq-desc order the winner row's successor carrying the same seq
    // IS the tie, so lead() detects it on the surviving row with zero
    // extra exchange; the guard rides the op column (always consumed
    // downstream, so pruning can't drop it)
    val tied = lead(col(seqCol), 1).over(w) === col(seqCol)
    // guard keys on (_rn = 1 AND tied): evaluation-order-proof — whether
    // Catalyst pushes the rn filter below this projection or not, only
    // the actual max-seq tie can fire
    val checkedOp = when(col("_rn") === 1 && tied, raise_error(concat(
        lit(s"applyChanges: two changes share the max $seqCol for key ("),
        concat_ws(",", keyCols.map(k => col(k).cast("string")): _*),
        lit(") — no defined winner")))).otherwise(col(opCol))
    val winner = changes
      .select((keyCols ++ payloadCols :+ opCol :+ seqCol).map(col): _*)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_op_checked", checkedOp)
      .filter(col("_rn") === 1)
      .drop(opCol)
      .select((keyCols ++ payloadCols ++ Seq("_op_checked", seqCol, "_rn"))
        .map(col): _*)
      .toDF(keyCols.map("_c_" + _) ++ payloadCols.map("_c_" + _)
        ++ Seq("_c_op", "_c_seq", "_rn"): _*)
    val b = base.select((keyCols ++ payloadCols).map(col): _*)
      .toDF(keyCols.map("_b_" + _) ++ payloadCols.map("_b_" + _): _*)
    val joinCond = keyCols.map(k => col("_b_" + k) === col("_c_" + k))
      .reduce(_ && _)
    val j = b.join(winner, joinCond, "full_outer")
    val hasChange = col("_c_" + keyCols.head).isNotNull
    val keys = keyCols.map(k =>
      coalesce(col("_c_" + k), col("_b_" + k)).as(k))
    val payload = payloadCols.map(c =>
      when(hasChange, col("_c_" + c)).otherwise(col("_b_" + c)).as(c))
    j.filter(!hasChange || col("_c_op") =!= "D")
      .select(keys ++ payload: _*)
  }

  /** Incremental VIEW maintenance for the (count, sum) aggregate family:
    * fold a change batch into a STANDING aggregate relation without
    * rescanning the base data — [[applyChanges]] maintains rows, this
    * maintains the aggregate built over them. At 100 TB the base aggregate
    * is key-cardinality-sized while the raw data is petabytes; nightly
    * full recompute is exactly the shuffle this avoids.
    *
    * `baseAgg` has `keyCols ++ (n_rows, sum_cents)` (build it once with
    * [[aggregateCents]]); `delta` is row-level with `opCol` ∈ {I, D} and
    * the raw value column. COUNT and SUM are self-maintainable under
    * inserts AND deletes (signed multiplicities, Griffin/Libkin-style); a
    * key whose count reaches zero leaves the relation. MIN/MAX are NOT
    * delete-maintainable without an auxiliary structure — by design out of
    * scope here; a delete on a min-carrying key must re-aggregate that key
    * from base (document, don't pretend).
    *
    * Shape: ONE delta-sized aggregate + ONE full-outer join on the key —
    * never touches base rows. Exact integer cents (the q150 idiom), so
    * incremental ≡ recompute bit-for-bit, which is the gate.
    */
  def incrementalAgg(baseAgg: DataFrame, delta: DataFrame,
                     keyCols: Seq[String], valueCol: String,
                     opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    // op ∈ {I, D}, enforced: anything else (a stray 'U', a null) counting
    // silently as an insert would double rows it meant to modify
    val sign = when(col(opCol) === "D", lit(-1L))
      .when(col(opCol) === "I", lit(1L))
      .otherwise(raise_error(concat(
        lit("incrementalAgg: op must be 'I' or 'D', got "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    val cents = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    val d = delta
      .select(keyCols.map(col) :+ sign.as("_sgn") :+ cents.as("_cents"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_sgn")).as("_dn"),
        sum(col("_sgn") * col("_cents")).as("_dsum"))
      .toDF(keyCols.map("_d_" + _) ++ Seq("_dn", "_dsum"): _*)
    val b = baseAgg.toDF(
      keyCols.map("_b_" + _) ++ Seq("_bn", "_bsum"): _*)
    val joinCond = keyCols.map(k => col("_b_" + k) === col("_d_" + k))
      .reduce(_ && _)
    val keys = keyCols.map(k =>
      coalesce(col("_d_" + k), col("_b_" + k)).as(k))
    b.join(d, joinCond, "full_outer")
      .select(keys :+
        (coalesce(col("_bn"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("n_rows") :+
        (coalesce(col("_bsum"), lit(0L)) + coalesce(col("_dsum"), lit(0L)))
          .as("sum_cents"): _*)
      .filter(col("n_rows") > 0)
  }

  /** The base-aggregate builder [[incrementalAgg]] maintains: exact integer
    * cents per key (one scan of base — paid ONCE, then only deltas).
    */
  def aggregateCents(base: DataFrame, keyCols: Seq[String],
                     valueCol: String): DataFrame =
    base.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum((col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
          .as("sum_cents"))

  /** The MIN/MAX base aggregate [[incrementalMinMax]] maintains (exact
    * integer cents, one base scan paid ONCE).
    */
  def minMaxCents(base: DataFrame, keyCols: Seq[String],
                  valueCol: String): DataFrame =
    base.groupBy(keyCols.map(col): _*)
      .agg(min((col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
          .as("min_cents"),
        max((col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
          .as("max_cents"))

  /** Delete-aware incremental MIN/MAX — the aggregate [[incrementalAgg]]'s
    * doc scopes OUT, done the only honest way: partial recompute.
    * COUNT/SUM absorb deletes algebraically; MIN/MAX cannot (deleting the
    * current min says nothing about the runner-up), so the standing rule
    * of IVM practice is: keys touched only by INSERTS merge in O(delta)
    * (least/greatest against the stored aggregate — never reading base);
    * keys with ≥ 1 DELETE are re-aggregated from base ∪ delta, and ONLY
    * those. The split is reported IN-BAND (`rescanned` BOOLEAN) so a
    * pipeline can audit how much of its maintenance ran on the cheap path.
    *
    * Multiset-exact: each D row removes ONE occurrence of its (key,
    * value); duplicate values survive until their count drops to zero; a
    * delete with no surviving occurrence to remove raises (loud, not
    * silent drift — the [[incrementalAgg]] op-validation posture). Keys
    * whose rows are all deleted leave the relation; `op` ∈ {I, D}
    * enforced the same way.
    *
    * Output: (keyCols*, min_cents, max_cents, rescanned BOOLEAN) —
    * identical to recomputing [[minMaxCents]] over the post-delta state,
    * bit-for-bit (the gate).
    *
    * Shape at 100 TB: base is touched through ONE semi-join on the
    * delete-affected key set (delta-sized; with key-partitioned base
    * storage this prunes to the affected partitions), everything else is
    * delta-sized or aggregate-sized: the insert-merge join is keyed on
    * the STORED AGGREGATE relation (|keys|, not |base|), and the rescan's
    * (key, value) count collapse is map-side combined.
    */
  def incrementalMinMax(base: DataFrame, baseAgg: DataFrame,
                        delta: DataFrame, keyCols: Seq[String],
                        valueCol: String, opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val sign = when(col(opCol) === "D", lit(-1L))
      .when(col(opCol) === "I", lit(1L))
      .otherwise(raise_error(concat(
        lit("incrementalMinMax: op must be 'I' or 'D', got "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    def cents(c: org.apache.spark.sql.Column) =
      (c.cast("decimal(18,2)") * 100).cast("long")
    val d = delta.select(
      keyCols.map(col) :+ sign.as("_sgn") :+ cents(col(valueCol)).as("_c"): _*)
    val affected = d.filter(col("_sgn") === -1L)
      .select(keyCols.map(col): _*).distinct()

    // Cheap path: insert-only keys merge against the stored aggregate.
    val insAgg = d.filter(col("_sgn") === 1L)
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("_c")).as("_imin"), max(col("_c")).as("_imax"))
      .toDF(keyCols.map("_i_" + _) ++ Seq("_imin", "_imax"): _*)
    val b = baseAgg.toDF(
      keyCols.map("_b_" + _) ++ Seq("_bmin", "_bmax"): _*)
    val joinCond = keyCols.map(k => col("_b_" + k) === col("_i_" + k))
      .reduce(_ && _)
    val mergedKeys = keyCols.map(k =>
      coalesce(col("_i_" + k), col("_b_" + k)).as(k))
    val merged = b.join(insAgg, joinCond, "full_outer")
      .select(mergedKeys :+
        least(col("_bmin"), col("_imin")).as("min_cents") :+
        greatest(col("_bmax"), col("_imax")).as("max_cents"): _*)
      .join(affected, keyCols, "left_anti")
      .withColumn("rescanned", lit(false))

    // Rescan path: base ∪ delta for the affected keys only, multiset-exact.
    val baseAff = base
      .select(keyCols.map(col) :+ lit(1L).as("_sgn") :+
        cents(col(valueCol)).as("_c"): _*)
      .join(affected, keyCols, "left_semi")
    val survivors = baseAff.unionByName(d.join(affected, keyCols, "left_semi"))
      .groupBy((keyCols :+ "_c").map(col): _*)
      .agg(sum(col("_sgn")).as("_n"))
      .withColumn("_n", when(col("_n") >= 0L, col("_n"))
        .otherwise(raise_error(concat(
          lit("incrementalMinMax: delete with no surviving occurrence "),
          lit("for value_cents="), col("_c").cast("string")))))
      .filter(col("_n") > 0L)
    val rescanned = survivors
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("_c")).as("min_cents"), max(col("_c")).as("max_cents"))
      .withColumn("rescanned", lit(true))

    merged.unionByName(rescanned)
  }
}
