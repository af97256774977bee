package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank aggregation across retrieval systems — the fusion step of a
  * hybrid search stack (BM25 + embedding ANN + recency + ...): each
  * system speaks only through RANKS, so wildly different score scales
  * (ppm BM25 vs cosine vs dot) never need calibrating against each other.
  */
object Ranking {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009): fused
    * score = Σ_systems 1/(kConst + rank), here as exact integer parts-
    * per-billion (each term is ONE floor division, so the fused score is
    * bit-portable across engines; k = 60 is the paper's constant). Items
    * missing from a system contribute nothing — no imputation, the
    * standard convention. Output: (queryCol, idCol, rrf_ppb, n_lists,
    * rank), top `topK` per query under the (rrf_ppb DESC, id) total
    * order — deterministic under ties.
    *
    * The rank contract (>= 1, the row_number convention) is enforced
    * IN-PLAN (the bootstrapDraws posture): a null or sub-1 rank would
    * silently corrupt a contribution — rank = −kConst even divides by
    * zero to NULL — instead of surfacing the upstream bug.
    *
    * Shape at 100 TB: inputs are already top-k-per-query relations
    * (bounded: |queries|·k rows each), so the union + one aggregate +
    * one bounded rank window is query-sized, never corpus-sized — the
    * corpus-heavy work lives in the upstream rankers.
    */
  def reciprocalRankFusion(rankings: Seq[DataFrame],
                           queryCol: String = "query_id",
                           idCol: String = "doc_id",
                           rankCol: String = "rank",
                           kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.size >= 2,
      s"fusion needs >= 2 rankings, got ${rankings.size}")
    require(kConst >= 1, s"kConst must be >= 1: $kConst")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val unioned = rankings.map { r =>
      val rk = col(rankCol).cast("long")
      val checked = when(rk.isNull || rk < 1L,
          raise_error(concat(
            lit("reciprocalRankFusion: rank must be >= 1, got "),
            rk.cast("string"))))
        .otherwise(rk)
      r.select(col(queryCol).as("_q"), col(idCol).as("_id"),
        checked.as("_rk"))
        .select(col("_q"), col("_id"),
          expr(s"1000000000L div (${kConst}L + _rk)").as("_c"))
    }.reduce(_ unionByName _)
    val fused = unioned.groupBy("_q", "_id")
      .agg(sum(col("_c")).as("rrf_ppb"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("_q"))
      .orderBy(col("rrf_ppb").desc, col("_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("_q").as(queryCol), col("_id").as(idCol),
        col("rrf_ppb"), col("n_lists"), col("rank"))
  }
}
