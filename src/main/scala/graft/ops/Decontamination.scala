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
  *   - the only corpus-side exchange feeds the final `groupBy(doc)` over
  *     the HIT rows, which is output-bound (contaminated shingles only).
  *
  * Shingles are 60-bit sha256 hashes ([[TextFns.shingleHashes]]) so the
  * broadcast carries fixed-width longs and the DuckDB oracle computes the
  * identical value (same 2^-60 collision caveat as q24, documented there).
  */
object Decontamination {

  /** Contamination report for every corpus doc that shares ≥1 shingle with
    * the eval side: (id, n_shingles, n_contaminated, contam_ratio), one row
    * per hit doc. `corpus` and `evalDocs` are separate frames — the honest
    * 100 TB API, since a benchmark set is its own small table; see the
    * predicate overload below for the single-table convenience form.
    *
    * Contract: `idCol` identifies a (single-text) document. Fully duplicated
    * rows collapse exactly like the oracle's global DISTINCT
    * (`countDistinct` over the hit shingles); two DIFFERENT texts under one
    * id are a caller error and yield one report row per distinct shingle
    * count rather than the merged-set report a global dedup would give.
    */
  def contamination(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, shingleSize: Int): DataFrame = {
    // eval side: small by construction — its distinct hashes broadcast.
    val evalShingles = evalDocs
      .select(explode(array_distinct(
        TextFns.shingleHashes(col(textCol), shingleSize))).as("sh"))
      .distinct()

    // corpus side: one scan; n_shingles is row-local, then explode. The
    // hash array materializes in its own projection so the two consumers
    // below share ONE ShingleHashes evaluation per row (CollapseProject
    // keeps non-cheap exprs referenced more than once in their own step).
    val corpusShingles = corpus
      .select(col(idCol), array_distinct(
        TextFns.shingleHashes(col(textCol), shingleSize)).as("_sh"))
      .select(col(idCol), size(col("_sh")).cast("long").as("n_shingles"),
        explode(col("_sh")).as("sh"))

    corpusShingles.join(broadcast(evalShingles), "sh")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(countDistinct(col("sh")).as("n_contaminated"))
      .select(col(idCol), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_shingles"))
          .as("contam_ratio"))
  }

  /** Single-table convenience: rows where `evalPred` holds are the eval
    * side, the rest the corpus. NOTE this plans TWO scans of `docs` (the
    * two filters are independent plan branches; Spark does not share one
    * scan across them) — fine when the source is a pruned columnar read,
    * but at full corpus scale prefer the two-frame form with the benchmark
    * set materialized as its own table.
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    evalPred: Column, shingleSize: Int = 3): DataFrame =
    // a NULL predicate must not route a row out of BOTH frames (filter
    // drops null-predicate rows on each side, so such a doc would ship to
    // the trainer unchecked and unreported): null counts as corpus-side
    contamination(docs.filter(!coalesce(evalPred, lit(false))),
      docs.filter(evalPred), idCol, textCol, shingleSize)
}
