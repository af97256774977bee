package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Benchmark decontamination: flag corpus documents that share word-n-gram
  * shingles with a held-out evaluation set — the standard pre-training
  * hygiene pass run before any corpus ships to a trainer.
  *
  * Scale shape (the reason this is NOT ngramJaccard with a flag): the eval
  * set is tiny relative to the corpus (benchmarks are thousands of docs;
  * the corpus is 100 TB), so its distinct shingle hashes are collected into
  * a broadcast side and the corpus side never shuffles its shingles at all:
  *
  *   - per-doc shingle dedup is row-local (`array_distinct` on the shingle
  *     array BEFORE explode — no `.distinct()` shuffle over corpus rows);
  *   - the contamination probe is a broadcast hash join (map-side);
  *   - the only exchange is the final `groupBy(doc)` over the HIT rows,
  *     which is output-bound (contaminated shingles only, combined map-side).
  *
  * Shingles are 60-bit sha256 hashes ([[TextFns.shingleHashes]]) so the
  * broadcast carries fixed-width longs and the DuckDB oracle computes the
  * identical value (same 2^-60 collision caveat as q24, documented there).
  */
object Decontamination {

  /** Contamination report for every corpus doc (rows where `evalPred` is
    * false) that shares ≥1 shingle with the eval side (`evalPred` true):
    * (id, n_shingles, n_contaminated, contam_ratio), one row per hit doc.
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    evalPred: Column, shingleSize: Int = 3): DataFrame = {
    val withSh = docs.select(
      col(idCol),
      evalPred.as("_is_eval"),
      array_distinct(TextFns.shingleHashes(col(textCol), shingleSize)).as("_sh"))

    // eval side: small by construction — its distinct hashes broadcast.
    val evalShingles = withSh.filter(col("_is_eval"))
      .select(explode(col("_sh")).as("sh")).distinct()

    // corpus side: one scan; n_shingles is row-local, then explode.
    val corpus = withSh.filter(!col("_is_eval"))
      .select(col(idCol), size(col("_sh")).cast("long").as("n_shingles"),
        explode(col("_sh")).as("sh"))

    corpus.join(broadcast(evalShingles), "sh")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(lit(1)).as("n_contaminated"))
      .select(col(idCol), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_shingles"))
          .as("contam_ratio"))
  }
}
