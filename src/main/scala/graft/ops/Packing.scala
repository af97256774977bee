package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: bin documents into fixed token-budget packs — the
  * batch-construction step of an LLM training-data pipeline (docs are
  * concatenated into ~context-length sequences; the pack id decides which
  * output sequence each document joins).
  *
  * Semantics: within each `groupCols` stratum, documents are taken in
  * `idCol` order and a document starts pack `floor(preceding_tokens /
  * budget)` — offset binning, deterministic and engine-portable (one
  * window sum; the greedy first-fit variant needs sequential state and is
  * neither). A pack can overflow by at most one document, which training
  * pipelines handle by truncation — documented trade for a shape that runs
  * as ONE window aggregation per stratum at any scale (no sequential scan,
  * no driver loop).
  */
object Packing {

  def packByTokenBudget(docs: DataFrame, idCol: String, textCol: String,
                        groupCols: Seq[String], budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("_prev_tokens",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("_prev_tokens") / budget))
      .drop("_prev_tokens")
  }
}
