package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, StringType}

/** Deterministic, engine-portable text/hash primitives used by the dedup /
  * similarity / text-analysis operators.
  *
  * Everything here is a codegen-friendly built-in expression. The 64-bit hash
  * is sha256-based (NOT murmur/xxhash) so the DuckDB oracle can reproduce it
  * bit-for-bit: `hash64(x) == CAST('0x' || substr(sha256(x),1,15) AS BIGINT)`.
  */
object TextFns {

  /** 60-bit positive hash from the sha256 hex prefix (15 hex chars).
    * Implemented as the native codegen expression [[graft.expressions.Sha256Prefix60]]
    * (no per-row hex/substring/decimal strings); [[hash64Composed]] is the
    * equivalent built-in chain, kept as the executable spec.
    */
  def hash64(c: Column): Column = graft.expressions.Sha256Prefix60(c)

  /** Built-in-only form of [[hash64]] — bit-identical, slower. */
  def hash64Composed(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  /** Seeded variant — the family {h_i} used for MinHash / hyperplanes. */
  def seededHash64(seed: Column, c: Column): Column =
    hash64(concat(seed.cast("string"), lit(":"), c))

  /** Unicode normalization (native expression [[graft.expressions.UnicodeNorm]];
    * form: nfc / nfkc / nfd / nfkd / strip_accents). Spark has no built-in —
    * composed 'é' and decomposed 'e'+U+0301 hash differently without it, so
    * exact dedup over real-web text MUST canonicalize first.
    */
  def unicodeNorm(c: Column, form: String = "nfc"): Column =
    graft.expressions.UnicodeNorm(c, form)

  /** NFD → drop combining marks → NFC: 'café' → 'cafe'. Parity with DuckDB's
    * strip_accents on decomposable characters is oracle-gated (q126).
    */
  def stripAccents(c: Column): Column =
    graft.expressions.UnicodeNorm(c, "strip_accents")

  /** The dedup canonical form: accents stripped (the strip pass already
    * normalizes — NFD, drop marks, NFC — so a separate NFC pre-pass would
    * be a wasted Normalizer traversal per row), lowercased, runs of
    * whitespace collapsed, trimmed. Row-local and codegen-resident — safe
    * to apply before hashing at any scale.
    */
  def canonicalize(c: Column): Column =
    trim(regexp_replace(lower(stripAccents(c)), "\\s+", " "))

  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles, 1-based indexing (mirrors DuckDB list[i]).
    * Empty array (not [1,0]-sequence garbage) when the doc is too short.
    */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val w = words(text)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k))): _*)))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** `transform(wordShingles(text, n), hash64)` fused into one native pass
    * over the text bytes ([[graft.expressions.ShingleHashes]]) — the
    * composed form above is an interpreted higher-order lambda building one
    * string per shingle, which profiling showed dominates the dedup suite.
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    graft.expressions.ShingleHashes(text, n)

  /** Four 60-bit sha256 parts per shingle (inner array; element 0 equals
    * [[shingleHashes]]) — the MinHash hash-family input.
    */
  def shingleParts(text: Column, n: Int = 3): Column =
    graft.expressions.ShingleParts(text, n)

  /** Polynomial rolling-hash document fingerprint over the first `prefixLen`
    * chars: fold(acc*31 + code) mod 1e9+7. Oracle equivalent:
    * list_reduce(list_prepend(0, codes), (a,b)->(a*31+b)%1000000007).
    */
  def rollingFingerprint(text: Column, prefixLen: Int = 64): Column =
    aggregate(
      transform(split(substring(text, 1, prefixLen), ""), ch =>
        ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31 + c, lit(1000000007L)))
}
