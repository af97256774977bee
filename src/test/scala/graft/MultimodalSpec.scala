package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal plumbing: binary payload schema, metadata, deterministic
  * partition-parallel feature extraction (stubbed decode).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"), (2L, "spark multimodal payloads"), (3L, "hello world"))
    .toDF("doc_id", "text")

  test("withPayload produces binary + typed metadata") {
    val p = Multimodal.withPayload(docs)
    val f = p.schema("payload").dataType.typeName
    assert(f == "binary")
    val meta = p.select($"media_meta.n_bytes").as[Long].collect()
    assert(meta.toSeq == Seq(11L, 25L, 11L))
  }

  test("extractFeatures is deterministic, dimension-correct, partition-independent") {
    val p = Multimodal.withPayload(docs)
    def run(parts: Int) =
      Multimodal.extractFeatures(spark, p.repartition(parts), dim = 4)
        .collect().sortBy(_.doc_id)
    val a = run(1); val b = run(3)
    assert(a.map(_.feature.toSeq).toSeq == b.map(_.feature.toSeq).toSeq)
    assert(a.forall(_.feature.length == 4))
    // identical payloads → identical checksum and features
    assert(a(0).checksum == a(2).checksum)
    assert(a(0).feature.toSeq == a(2).feature.toSeq)
    assert(a(0).checksum != a(1).checksum)
  }
}
