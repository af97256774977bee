package graft

import org.apache.spark.sql.functions._

import graft.ops.Output

/** Rendezvous (HRW) placement + compaction planner — engine-local laws;
  * cross-engine bit parity is oracle-gated (q242 / q243).
  */
class OutputPlannerSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int) =
    spark.range(n).select(col("id").as("k"), (col("id") % 4).as("grp"))

  test("rendezvous: growing 8 -> 9 shards moves keys ONLY to the new shard") {
    // THE consistent-placement law: a key's winner among shards 0..7 is
    // still its winner among 0..8 unless shard 8 outscores it — so every
    // mover lands on shard 8, and nothing reshuffles between old shards.
    val df = keys(2000)
    val a8 = Output.rendezvousAssign(df, "k", 8, "s8")
    val a9 = Output.rendezvousAssign(df, "k", 9, "s9").select("k", "s9")
    val joined = a8.join(a9, "k").cache()
    val movers = joined.filter(col("s8") =!= col("s9"))
    assert(movers.filter(col("s9") =!= 8).count() == 0,
      "a mover landed somewhere other than the new shard")
    val nMoved = movers.count()
    // E[moved] = 2000/9 ≈ 222 (binomial sd ≈ 14); 5σ+ bounds
    assert(nMoved > 140 && nMoved < 310, s"moved $nMoved of 2000, expected ~222")
    joined.unpersist()
  }

  test("rendezvous: assignment is balanced and stable across evaluations") {
    val df = keys(2000)
    val counts = Output.rendezvousAssign(df, "k", 9)
      .groupBy("shard_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 9).toSet, s"empty shard: $counts")
    // mean 222, binomial sd ≈ 14 — same 5σ+ bounds as the move census
    counts.values.foreach(c => assert(c > 140 && c < 310, s"imbalance: $counts"))
    // determinism: a second evaluation is bit-identical (no RNG anywhere)
    val again = Output.rendezvousAssign(df, "k", 9)
      .groupBy("shard_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("rendezvous: shrinking 9 -> 8 moves exactly the removed shard's " +
    "keys, scattered over the survivors") {
    val df = keys(2000)
    val a9 = Output.rendezvousAssign(df, "k", 9, "s9")
    val a8 = Output.rendezvousAssign(df, "k", 8, "s8").select("k", "s8")
    val joined = a9.join(a8, "k").cache()
    // every mover came FROM the removed shard 8...
    assert(joined.filter(col("s9") =!= col("s8"))
      .filter(col("s9") =!= 8).count() == 0)
    // ...and every shard-8 key moved (its winner no longer exists)
    assert(joined.filter(col("s9") === 8)
      .filter(col("s9") === col("s8")).count() == 0)
    // census supports the shrink direction with the same numbers
    val census = Output.rendezvousMoveCensus(df, "k", "grp", 9, 8)
      .agg(sum("n_moved")).head().getLong(0)
    assert(census == joined.filter(col("s9") =!= col("s8")).count())
    joined.unpersist()
  }

  test("rendezvousMoveCensus agrees with the two direct assignments") {
    val df = keys(2000)
    val census = Output.rendezvousMoveCensus(df, "k", "grp", 8, 9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val direct = Output.rendezvousAssign(df, "k", 8, "s8")
      .join(Output.rendezvousAssign(df, "k", 9, "s9").select("k", "s9"), "k")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum((col("s8") =!= col("s9")).cast("long")).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(census.keySet == direct.keySet)
    census.foreach { case (g, (n, m, ppm)) =>
      assert((n, m) == direct(g), s"census disagrees for grp=$g")
      assert(ppm == 1000000L * m / n, s"ppm not exact-integer for grp=$g")
    }
  }

  test("compactionGroups replays the greedy fold exactly, one huge file " +
    "gets its own group, overshoot is bounded by one file") {
    // two partitions: p0 = 20 uniform small files + one 5000-byte outlier;
    // p1 = ragged sizes
    val files = ((0 until 20).map(i =>
        ("p0", i.toLong, if (i == 10) 5000L else 300L)) ++
      (0 until 7).map(i => ("p1", i.toLong, 100L + 350L * (i % 3))))
      .toDF("src", "file_id", "bytes")
    val got = Output.compactionGroups(files, "src", "file_id", "bytes", 1000L)
      .select("src", "file_id", "bytes", "compaction_group")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // driver-side replay of the law: group = floor(precedingBytes/target)
    val expected = files.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (src, fs) =>
        var cum = 0L
        fs.toSeq.sortBy(_._2).map { case (_, id, b) =>
          val g = cum / 1000L; cum += b; (src, id) -> (b, g)
        }
      }.toMap
    assert(got == expected)
    // overshoot law: drop any group's LAST file and it is under target
    // (greedy closes the group at the first file crossing the boundary)
    got.toSeq.groupBy { case ((src, _), (_, g)) => (src, g) }
      .foreach { case ((src, g), members) =>
        val inOrder = members.sortBy(_._1._2)
        val total = inOrder.map(_._2._1).sum
        val last = inOrder.last._2._1
        assert(total - last < 1000L,
          s"group ($src,$g) over target even without its last file")
      }
  }

  test("compactionGroups: group ids may legitimately skip past a huge file") {
    // one 5-target file advances the cumulative sum by 5 groups — the id
    // sequence skips, and that is the contract (a big-enough file is its
    // own rewrite group; nothing merges across it)
    val files = Seq(("p", 0L, 5000L), ("p", 1L, 100L))
      .toDF("src", "file_id", "bytes")
    val ids = Output.compactionGroups(files, "src", "file_id", "bytes", 1000L)
      .orderBy("file_id").select("compaction_group")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(0L, 5L))
  }
}
