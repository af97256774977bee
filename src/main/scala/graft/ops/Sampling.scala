package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deterministic corpus splitting/sampling — the train/val/test machinery a
  * training-data pipeline needs. Everything derives from the shared
  * sha256-based hash64 so splits are (a) stable across runs and engines
  * (no RNG, oracle-reproducible), (b) decided row-locally (no shuffle, no
  * coordination — the property that matters at 100 TB), and (c) stratified
  * for free when keyed on a group column instead of the row id (all rows of
  * one group land in one split — leakage-safe splits by document/source).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the key column. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(TextFns.hash64(key.cast("string")), lit(buckets.toLong))

  /** Assign a split label by cumulative percentage: e.g.
    * Seq("train" -> 90, "val" -> 5, "test" -> 5). Keyed on `key` — pass the
    * row id for row-level splits or a group id (source, url domain, author)
    * for leakage-safe group splits.
    *
    * A null key yields a NULL split (surfaced, not silently routed into the
    * last split): deciding where unkeyed rows belong is the caller's call,
    * and a silent default would skew whichever split it picked. Matches
    * [[hashSample]], which likewise drops null-key rows.
    */
  def hashSplit(df: DataFrame, key: Column,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must total 100")
    // each entry must be positive on its own: 110/-10 sums to 100 but
    // silently yields a 100%/0% split instead of a rejected argument
    require(splits.forall(_._2 > 0),
      s"each split percentage must be positive: $splits")
    val bucket = hashBucket(key, 100)
    val label = splits.tail.scanLeft((splits.head._1, splits.head._2)) {
      case ((_, acc), (name, pct)) => (name, acc + pct)
    }.foldRight(lit(null).cast("string")) {
      case ((name, cum), other) => when(bucket < cum, lit(name)).otherwise(other)
    }
    df.withColumn("split", label)
  }

  /** Deterministic p% sample: keep rows whose hash bucket falls below
    * `percent` — the repeatable TABLESAMPLE (same rows every run/engine).
    */
  def hashSample(df: DataFrame, key: Column, percent: Int): DataFrame =
    df.filter(hashBucket(key, 100) < percent)

  /** EXACT-count stratified holdout: per group, EXACTLY
    * floor(n·num/den) rows go to the holdout, chosen by the shared
    * deterministic hash order (salted, id-tiebroken) — where
    * [[hashSplit]] gives each row an independent p% chance (so a small
    * stratum's realized fraction wanders), this pins the per-stratum
    * COUNT, which eval-set construction usually requires ("exactly 10%
    * of every language"). Same rows every run and every engine.
    *
    * Shape at 100 TB: ONE group-partitioned window (rank by hash) with
    * the group-count window sharing the key; row-local threshold filter.
    *
    * Output: input keyCols + (groupCol, split 'holdout'|'train').
    */
  def exactStratifiedSplit(df: DataFrame, groupCol: String, idCol: String,
                           num: Int, den: Int,
                           salt: String = "strat"): DataFrame = {
    require(num >= 1 && num < den, s"need 0 < num/den < 1, got $num/$den")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_h"), col(idCol))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    df.withColumn("_h",
        TextFns.hash64(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(wN).cast("long"))
      .withColumn("split",
        when(col("_rn") <= expr(s"_n * ${num}L div ${den}L"), lit("holdout"))
          .otherwise(lit("train")))
      .drop("_h", "_rn", "_n")
  }

  /** Weighted sampling WITHOUT replacement, k rows, inclusion probability
    * proportional to `weight` — Efraimidis–Spirakis A-ES: each row draws
    * u in (0,1) and the k largest u^(1/w) win. The draw is the shared
    * deterministic hash (not RNG), so the sample is reproducible across
    * runs AND engines — the corpus-subsetting law a token-budget-
    * proportional training draw needs (weight = token count → each
    * document's chance matches its share of the token budget).
    *
    * Scale: the key is computed row-locally; the only coordination is a
    * distributed top-k (TakeOrderedAndProject — per-partition heaps of k,
    * never a global sort), so the pattern holds at any corpus size where
    * k fits on the driver. Ties broken by `key` for determinism; weights
    * must be strictly positive.
    *
    * Portability caveat (unlike the integer-exact hash ops in this file):
    * u^(1/w) goes through `pow`, which is not correctly rounded — two
    * engines' libm may differ in the last ulp. Selection only diverges if
    * the k-th and (k+1)-th keys are within that ulp (u values are spread
    * over [0,1] at 1e-6 granularity, so the practical probability is nil,
    * and the q127 gate would catch a platform where it isn't).
    */
  def weightedTopK(df: DataFrame, key: Column, weight: Column,
                   k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (hashBucket(key, 1000000).cast("double") + lit(0.5)) / lit(1e6)
    // enforce the strictly-positive-weight contract in-plan (the
    // bootstrapDraws posture): weight = 0 would die later as an unrelated
    // ANSI DIVIDE_BY_ZERO, and a NEGATIVE weight flips the exponent so
    // pow(u, 1/w) > 1 — every bad row silently outranks every valid one
    val w = weight.cast("double")
    val checkedW = when(w.isNull || w <= 0d,
        raise_error(concat(lit("weightedTopK: weight must be positive, got "),
          w.cast("string")))).otherwise(w)
    df.withColumn("__es_key", pow(u, lit(1.0) / checkedW))
      .orderBy(col("__es_key").desc, key)
      .limit(k)
      .drop("__es_key")
  }

  /** Deterministic negative sampling — the contrastive-pair generator an
    * embedding-training pipeline needs: k partners per row chosen by the
    * shared hash over a DENSE id space [0, n), so the samples are
    * reproducible across runs and engines (no RNG, no shuffle to pick —
    * the only exchange is the caller's join to fetch partner payloads).
    *
    * Partner law: `neg = (id + 1 + hash64(id # rank) mod (n-1)) mod n` —
    * the stride lies in [1, n-1], so a self-pair is IMPOSSIBLE by
    * construction (no rotation special-case). Draws are independent per
    * rank, i.e. sampling WITH replacement: a row can draw the same
    * partner at two ranks with ~k²/2n probability — the standard
    * negative-sampling law, benign for InfoNCE-style losses; dedup
    * downstream if a use case needs distinct partners. A single-row
    * corpus has no possible negative and yields an EMPTY result (not a
    * self-pair).
    *
    * `idCol` must be dense 0..n-1 (the testdata's doc_id; build one with
    * zipWithIndex/rangeShardAssign otherwise). Emits (idCol, neg_rank,
    * neg_id); join payloads on neg_id downstream.
    */
  def negativeSamples(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // n as a one-row broadcast relation — no driver collect
    val n = broadcast(df.agg(count(lit(1)).as("__n")))
    val ranked = df.select(col(idCol))
      .crossJoin(n)
      .select(col(idCol), col("__n"),
        explode(sequence(lit(0), lit(k - 1))).as("neg_rank"))
    val stride = lit(1) + pmod(TextFns.hash64(
      concat(col(idCol).cast("string"), lit("#"),
        col("neg_rank").cast("string"))),
      greatest(col("__n") - 1, lit(1))) // ANSI-safe when n = 1
    ranked
      // n = 1 → no negative exists; emit nothing rather than a self-pair
      .withColumn("neg_id",
        when(col("__n") > 1, pmod(col(idCol) + stride, col("__n"))))
      .filter(col("neg_id").isNotNull)
      .drop("__n")
  }

  /** Domain balancing: keep at most `cap` rows per `group` value (the
    * C4/Pile-style guard against one domain dominating the corpus). The
    * survivors are chosen DETERMINISTICALLY — hash-ordered by `key` with
    * the key itself as tiebreak — so the cap is a stable uniform sample of
    * the group, not "whatever the scan returned first" (which varies with
    * file order and parallelism, and silently biases toward old data when
    * sources append chronologically).
    *
    * One shuffle on `group`; the per-group sort is bounded by WindowExec's
    * spilling sort. For pathological single-group skew, compose with
    * [[graft.ops.Skew]] salting or pre-filter via [[hashSample]] at
    * cap/|group| percent to shed rows before the window.
    */
  def capPerGroup(df: DataFrame, group: Column, key: Column,
                  cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    // nulls LAST: hash64(null) is null, and the default ascending order
    // would put null-key rows FIRST — they would deterministically win
    // every cap slot, the opposite of this file's null-key discipline
    // (and of DuckDB's NULLS LAST default the oracle compares against)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group)
      .orderBy(TextFns.hash64(key.cast("string")).asc_nulls_last,
        key.asc_nulls_last)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Epoch-weighted repetition — the UPSAMPLING half of the training-mix
    * story ([[weightedMixture]] is the downsampling half): each row is
    * emitted `factorPct/100` times, plus one more copy for the fractional
    * remainder decided row-locally from the shared hash (factorPct = 250
    * → every row twice, and a deterministic 50% of rows a third time).
    * No shuffle, no RNG; the emitted `copy` ordinal (1-based) keeps the
    * repetitions distinguishable for downstream shard writers and
    * dedup-safe accounting. factorPct = 0 drops the group entirely;
    * groups absent from `factors` (and null group values) take
    * `defaultFactorPct`. A NULL `key` has no hash identity, so such rows
    * get exactly the integer copies and never the fractional one (the
    * same null-key law as [[hashSample]] — for factorPct < 100 that
    * means null-key rows are dropped; pre-assign keys if they must
    * survive).
    */
  def repeatWeighted(df: DataFrame, key: Column, group: Column,
                     factors: Seq[(String, Int)],
                     defaultFactorPct: Int = 100,
                     copyCol: String = "copy"): DataFrame = {
    factors.foreach { case (g, p) =>
      require(p >= 0, s"factor percent for '$g' must be >= 0, got $p")
    }
    require(defaultFactorPct >= 0,
      s"defaultFactorPct must be >= 0, got $defaultFactorPct")
    require(!df.columns.contains(copyCol),
      s"output column '$copyCol' already exists on the input")
    val pct = factors.foldRight(lit(defaultFactorPct)) {
      case ((g, p), other) => when(group === g, lit(p)).otherwise(other)
    }
    val copies = (pct / 100).cast("int") +
      when(hashBucket(key, 100) < pct % 100, 1).otherwise(0)
    // Spark's sequence(1, 0) counts DOWN ([1, 0]) instead of returning
    // empty — guard so zero-copy rows vanish rather than duplicating
    val seq = when(copies >= 1,
      sequence(lit(1), copies)).otherwise(array())
    df.withColumn(copyCol, explode(seq))
  }

  /** Source-mixture downsampling: per-row keep-percentage chosen by the
    * row's `group` value (e.g. language or domain weights when flattening
    * a multi-source corpus into one training mix). Decided row-locally
    * from the shared hash — no shuffle, reproducible across runs and
    * engines, and upsampling-free by construction (a percentage can only
    * keep ≤ 100%; repetition policy is [[repeatWeighted]]).
    *
    * Groups absent from `pcts` keep `defaultPct`; null group values use
    * the default too (a null domain is still data — silently dropping it
    * would skew the mix).
    */
  def weightedMixture(df: DataFrame, key: Column, group: Column,
                      pcts: Seq[(String, Int)],
                      defaultPct: Int = 100): DataFrame = {
    pcts.foreach { case (g, p) =>
      require(p >= 0 && p <= 100, s"percentage for '$g' out of [0,100]: $p")
    }
    require(defaultPct >= 0 && defaultPct <= 100,
      s"defaultPct out of [0,100]: $defaultPct")
    val pct = pcts.foldRight(lit(defaultPct)) {
      case ((g, p), other) => when(group === g, lit(p)).otherwise(other)
    }
    df.filter(hashBucket(key, 100) < pct)
  }

  /** Greedy selection under a per-group budget: rank rows within each
    * group by (score desc, id asc — deterministic) and keep the prefix
    * whose cumulative `weight` stays within `budget` (inclusive) — "the
    * best docs from each source until its token budget is spent", the
    * data-selection step of training-mix construction (greedy
    * quality-per-token knapsack).
    *
    * Scale shape: ONE group-partitioned window (running sum); the filter
    * is row-local. Groups sort in parallel; nothing global.
    *
    * Output: input columns + `cum_weight` (running total including the
    * row itself), only the selected rows.
    */
  def budgetSelect(df: DataFrame, groupCol: String, scoreCol: String,
                   weightCol: String, idCol: String,
                   budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // weights must be present and non-negative, enforced in-plan: a NULL
    // weight is skipped by the window sum (a free rider that consumes no
    // budget), and a NEGATIVE one makes cum_weight non-monotone so rows
    // AFTER the overflow point re-enter the "prefix"
    val rawW = col(weightCol).cast("long")
    val checkedW = when(rawW.isNull || rawW < 0L,
        raise_error(concat(
          lit("budgetSelect: weight must be non-null and >= 0, got "),
          rawW.cast("string")))).otherwise(rawW)
    df.withColumn("cum_weight", sum(checkedW).over(w))
      .filter(col("cum_weight") <= budget)
  }

  /** Leakage-safe train/val/test split: the split key is the document's
    * near-dup CLUSTER representative, not the document — so a family of
    * near-duplicates can never straddle train and test (the eval-
    * contamination hole a per-doc hash split leaves open; singletons
    * represent themselves). `clusters` is a (idCol, canonical_id) labeling
    * — [[graft.ops.Dedup.connectedComponents]] output over any near-dup
    * pair graph.
    *
    * Scale shape: one left join keyed by id (the cluster labeling only
    * covers CLUSTERED docs, usually a small fraction, so the planner may
    * broadcast it) and the row-local hash-split projection. The leakage
    * invariant needs no enforcement pass — equal rep ⇒ equal bucket by
    * construction.
    *
    * Output: input columns + (rep, split).
    */
  def clusterSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       splits: Seq[(String, Int)]): DataFrame = {
    val lab = clusters.select(col(idCol), col("canonical_id"))
    val withRep = df.join(lab, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("canonical_id"), col(idCol)))
      .drop("canonical_id")
    hashSplit(withRep, col("rep"), splits)
  }

  /** Weighted sampling WITH replacement (bootstrap draws): `nDraws`
    * independent draws, each landing on a row with probability
    * weight/total — the resampling primitive behind bootstrap confidence
    * intervals and temperature-flattened corpus mixes that
    * [[weightedTopK]] (without-replacement) can't produce. Deterministic:
    * draw j targets u_j = hash64(seed:j) mod total, and rows partition
    * [0, total) into weight-sized intervals by id order, so every engine
    * lands every draw on the same row.
    *
    * Scale shape: the cumulative interval bounds come from a
    * range-partition + per-partition running sum + broadcast
    * partition-offset cumsum (the q183 global-rank pattern — never a
    * single-partition window over the corpus). The draw→row lookup is an
    * EQUI-join on a bin index of width ⌈total/nDraws⌉: a row fans out to
    * (weight/binWidth + 1) bins, so the exploded relation is
    * O(nDraws + rows) — no inequality join, no broadcast of the corpus.
    *
    * Output: (draw_id, id) — one row per draw. Weights must be positive
    * — ENFORCED: a null/zero/negative weight fails the job (in-plan
    * `raise_error`, no extra pass) rather than silently corrupting the
    * cumulative interval bounds.
    */
  def bootstrapDraws(df: DataFrame, idCol: String, weightCol: Column,
                     nDraws: Long, seed: String): DataFrame = {
    require(nDraws >= 1, s"nDraws must be >= 1: $nDraws")
    import org.apache.spark.sql.expressions.{Window => W}
    // Enforce the documented positive-weight contract in-plan: a negative
    // weight silently corrupts every downstream cumulative bound and a
    // null/zero row silently never draws — fail the job instead (zero
    // extra passes: the check rides the first projection).
    val rawW = weightCol.cast("long")
    val checkedW = when(rawW.isNull || rawW <= 0L,
        raise_error(concat(lit("bootstrapDraws: weight must be positive, " +
          s"got weight="), rawW.cast("string"),
          lit(s" at $idCol="), col(idCol).cast("string"))))
      .otherwise(rawW)
    // duplicate ids collapse to ONE interval with their summed weight:
    // the running sum's default RANGE frame treats equal-id rows as frame
    // PEERS sharing one cumulative bound, which would overlap their
    // intervals (a draw landing twice) and leave a gap (a draw landing
    // nowhere). Output keys on the id anyway, so merging mass is the
    // correct semantics, and unique keys make the window deterministic.
    val base = df.select(col(idCol).as("_id"), checkedW.as("_w"))
      .groupBy("_id").agg(sum("_w").as("_w"))
    val parts = base.repartitionByRange(col("_id"))
      .withColumn("_pid", spark_partition_id())
    val local = parts.withColumn("_lhi",
      sum("_w").over(W.partitionBy("_pid").orderBy("_id")))
    val offsets = local.groupBy("_pid").agg(sum("_w").as("_pw"))
      .withColumn("_off", coalesce(sum("_pw").over(W.orderBy("_pid")
        .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_off")
    val bounded = local.join(broadcast(offsets), "_pid")
      .select(col("_id"), col("_w"),
        (col("_off") + col("_lhi")).as("_hi"))
    val total = bounded.agg(sum("_w").as("_total"))
    // bin width ~ total/nDraws keeps the exploded row-bin relation at
    // O(nDraws + rows)
    val binned = bounded.crossJoin(broadcast(total))
      .withColumn("_bw", expr(s"greatest(_total div ${nDraws}L, 1L)"))
      .select(col("_id"), col("_w"), col("_hi"), col("_bw"),
        explode(sequence(expr("(_hi - _w) div _bw"),
          expr("(_hi - 1) div _bw"))).as("_bin"))
    val draws = total
      .select(col("_total"), explode(sequence(lit(0L), lit(nDraws - 1)))
        .as("draw_id"))
      .withColumn("_u", graft.functions.TextFns.seededHash64(
        lit(seed), col("draw_id").cast("string")) % col("_total"))
      .withColumn("_bw", expr(s"greatest(_total div ${nDraws}L, 1L)"))
      .select(col("draw_id"), col("_u"), expr("_u div _bw").as("_bin"))
    draws.join(binned, "_bin")
      .filter(col("_u") >= col("_hi") - col("_w") && col("_u") < col("_hi"))
      .select(col("draw_id"), col("_id").as(idCol))
  }

  /** Largest feasible downsample at an exact target mixture — the
    * training-mix construction step ("40% en / 15% each of the rest")
    * when upsampling is off the table: compute the biggest total T such
    * that every group g can supply its share want_g = ⌊T·target_g/10⁶⌋
    * from its n_g available rows, then select EXACTLY want_g rows per
    * group by the shared deterministic hash order (salted, id-tiebroken —
    * same rows every run and engine). Contrast [[weightedMixture]], which
    * applies caller-chosen independent per-group rates (realized mixture
    * wanders); here the RATES are derived and the COUNTS are pinned.
    *
    * T = min over target groups of ⌊n_g·10⁶/target_g⌋ — the bottleneck
    * group is taken (almost) whole and everything else downsampled to
    * match. A target group absent from `df` (n_g = 0) makes T = 0 and the
    * selection empty: an unsatisfiable mixture is surfaced as zero rows,
    * not silently renormalized. Groups not named in `targetsPpm` are
    * excluded (target 0).
    *
    * Scale shape: one tiny per-group count aggregate → global min
    * (broadcast both), then ONE group-partitioned window rank over the
    * kept groups. No driver state, no collect; the only full-data
    * exchange is the rank window, same as [[exactStratifiedSplit]].
    *
    * Output: input columns + `want` (the group's pinned count), selected
    * rows only.
    */
  def mixtureRebalance(df: DataFrame, groupCol: String, idCol: String,
                       targetsPpm: Seq[(String, Long)],
                       salt: String = "mix"): DataFrame = {
    require(targetsPpm.nonEmpty, "targetsPpm must be non-empty")
    require(targetsPpm.map(_._2).sum == 1000000L,
      s"target ppm must total 1000000: $targetsPpm")
    require(targetsPpm.forall(_._2 > 0),
      s"each target ppm must be positive: $targetsPpm")
    require(targetsPpm.map(_._1).distinct.size == targetsPpm.size,
      s"duplicate group in targets: $targetsPpm")
    val spark = df.sparkSession
    import spark.implicits._
    val targets = targetsPpm.toDF("_grp", "_target_ppm")
    val counts = df.groupBy(col(groupCol).as("_grp"))
      .agg(count(lit(1)).as("_n"))
    // left join from TARGETS so an absent group contributes n_g = 0 (and
    // thus T = 0) instead of dropping out of the min
    val avail = targets.join(counts, Seq("_grp"), "left")
      .withColumn("_n", coalesce(col("_n"), lit(0L)))
    val feasible = avail
      .agg(min(expr("_n * 1000000L div _target_ppm")).as("_t"))
    val want = avail.crossJoin(broadcast(feasible))
      .select(col("_grp"), expr("_t * _target_ppm div 1000000L").as("want"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_h"), col(idCol))
    df.join(broadcast(want), df(groupCol) === col("_grp"))
      .withColumn("_h",
        TextFns.hash64(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
      .withColumn("_rn", row_number().over(w).cast("long"))
      .filter(col("_rn") <= col("want"))
      .drop("_grp", "_h", "_rn")
  }

  /** Per-group effective sample size under weighted sampling — the
    * pre-flight diagnostic of every mixture/importance-weighting step
    * (Kish's ESS = (Σw)²/Σw²): a source whose clipped weights concentrate
    * on a few rows contributes far fewer EFFECTIVE examples than its row
    * count, and this census says exactly how many, before any sampling
    * runs. Weights are clipped at `clipAt` first (the standard
    * variance/ESS trade — report both sides by calling twice if the
    * unclipped view is also wanted).
    *
    * Output per group: (group, n, sum_w, sum_w2, ess_ppm) where
    * ess_ppm = ⌊10⁶·(Σw)² / (n·Σw²)⌋ — ESS as a fraction of the group's
    * row count, 10⁶ = every row fully effective (all weights equal),
    * → 0 = the mass sits on one row. All-integer; sums are exact 128-bit
    * ([[graft.expressions.Sum128]]) so billion-row groups with large
    * weights cannot overflow, and the final ratio is one integral
    * division per GROUP (exact while 10⁶·(Σw)² < 10³⁸, i.e. Σ of CLIPPED
    * weights < 10¹⁶ — the same headroom an int128 engine has; the clip
    * is what keeps real corpora inside it). Positive-weight contract enforced in-plan like
    * [[bootstrapDraws]]. ONE map-side-combined aggregate — no window, no
    * second pass.
    */
  def effectiveSampleSize(df: DataFrame, groupCol: String,
                          weightCol: Column, clipAt: Long): DataFrame = {
    require(clipAt >= 1, s"clipAt must be >= 1: $clipAt")
    val rawW = weightCol.cast("long")
    val checkedW = when(rawW.isNull || rawW <= 0L,
        raise_error(concat(
          lit("effectiveSampleSize: weight must be positive, got "),
          rawW.cast("string"))))
      .otherwise(least(rawW, lit(clipAt)))
    val dec38 = "DECIMAL(38,0)"
    df.select(col(groupCol), checkedW.as("_w"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        graft.expressions.Sum128(col("_w")).as("_sw"),
        graft.expressions.Sum128(col("_w") * col("_w")).as("_sw2"))
      .select(col(groupCol), col("n"),
        col("_sw").cast("long").as("sum_w"),
        col("_sw2").cast("long").as("sum_w2"),
        expr(s"CAST((CAST(1000000 AS $dec38) * _sw * _sw) div " +
          s"(CAST(n AS $dec38) * _sw2) AS BIGINT)").as("ess_ppm"))
  }

  /** Water-filling budget allocation — `mixtureRebalance`'s complement:
    * that op keeps the target mixture EXACT and shrinks the total; this
    * one keeps the TOTAL (spend the whole token budget) and bends the
    * mixture minimally — a saturated source (availability below its
    * proportional share) contributes everything it has, and its unmet
    * share redistributes across the unsaturated sources in target
    * proportion. The fixpoint is found by simultaneous (Jacobi) rounds:
    * λ = (B − Σ_sat avail) / Σ_unsat weight; source i saturates when
    * avail_i ≤ λ·w_i (compared as exact integer cross-products — no
    * rational ever materializes); unsaturated allocation is
    * ⌊λ·w_i⌋, so Σ alloc ≤ B with < |unsat| floor slack. Converges in
    * ≤ |sources| rounds (each round saturates ≥ 1 source or stops).
    *
    * Shape at 100 TB: the AVAILABILITY census is the distributed half
    * (one map-side-combined aggregate over the corpus); the fill itself
    * runs on the collected ≤|targets| rows with BigInt products — the
    * target list is caller-provided and model-sized BY CONSTRUCTION, so
    * driver math here is the honest call, not a scale hole (the
    * kmeans-centroids / MMR-k-rows precedent).
    *
    * Output: (source, avail, weight_ppm, allocation, saturated),
    * sources missing from the corpus carry avail = 0 (saturated at 0).
    */
  def budgetWaterFill(df: DataFrame, sourceCol: String, availCol: Column,
                      targetsPpm: Seq[(String, Long)],
                      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val rows = availabilityCensus(df, sourceCol, availCol, targetsPpm)
    waterFillFromCensus(df.sparkSession, rows, budget)
  }

  /** [[budgetWaterFill]] with the budget expressed as a FRACTION of the
    * targets' own availability (e.g. "spend 95% of what the target
    * languages actually have"): budget = ⌊Σ_targets avail · num / den⌋.
    * Derived from the SAME one-aggregate availability census the fill
    * uses — one scan total, and the budget basis is by construction the
    * census the allocator sees (a corpus row outside the target list
    * can never skew the budget, which a separate whole-corpus total
    * silently would). */
  def budgetWaterFillShare(df: DataFrame, sourceCol: String,
                           availCol: Column,
                           targetsPpm: Seq[(String, Long)],
                           shareNum: Long, shareDen: Long): DataFrame = {
    require(shareDen >= 1, s"shareDen must be >= 1: $shareDen")
    require(shareNum >= 0 && shareNum <= shareDen,
      s"share must be in [0, 1]: $shareNum/$shareDen")
    val rows = availabilityCensus(df, sourceCol, availCol, targetsPpm)
    val budget =
      (rows.map(r => BigInt(r._2)).sum * shareNum / shareDen).toLong
    waterFillFromCensus(df.sparkSession, rows, budget)
  }

  /** One map-side-combined aggregate over the corpus → (source, avail,
    * weight_ppm) for exactly the declared targets (missing → 0). */
  private def availabilityCensus(df: DataFrame, sourceCol: String,
                                 availCol: Column,
                                 targetsPpm: Seq[(String, Long)])
      : Seq[(String, Long, Long)] = {
    require(targetsPpm.nonEmpty, "targetsPpm must be non-empty")
    require(targetsPpm.map(_._2).sum == 1000000L,
      s"target ppm must total 1e6: ${targetsPpm.map(_._2).sum}")
    require(targetsPpm.forall(_._2 > 0),
      s"each target ppm must be positive: $targetsPpm")
    require(targetsPpm.map(_._1).distinct.size == targetsPpm.size,
      "duplicate sources in targetsPpm")
    val availRows = df
      .filter(col(sourceCol).cast("string")
        .isin(targetsPpm.map(_._1): _*))
      .groupBy(col(sourceCol).cast("string").as("_s"))
      .agg(sum(availCol.cast("long")).as("_a"))
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    targetsPpm.map { case (s, w) =>
      (s, math.max(0L, availRows.getOrElse(s, 0L)), w)
    }
  }

  /** Jacobi saturation rounds over the model-sized census (see
    * [[budgetWaterFill]] Scaladoc for the fixpoint argument). */
  private def waterFillFromCensus(spark: org.apache.spark.sql.SparkSession,
                                  rows: Seq[(String, Long, Long)],
                                  budget: Long): DataFrame = {
    var sat = Set.empty[String]
    var num = BigInt(budget)
    var den = BigInt(rows.map(_._3).sum)
    var changed = true
    while (changed && sat.size < rows.size) {
      num = BigInt(budget) - BigInt(rows.filter(r => sat(r._1)).map(_._2).sum)
      den = BigInt(rows.filterNot(r => sat(r._1)).map(_._3).sum)
      val newly = rows.filter { case (s, a, w) =>
        !sat(s) && BigInt(a) * den <= num * BigInt(w)
      }.map(_._1)
      changed = newly.nonEmpty
      sat = sat ++ newly
    }
    val out = rows.map { case (s, a, w) =>
      val alloc =
        if (sat(s)) a
        else (num * BigInt(w) / den).toLong // den > 0: unsat set non-empty
      (s, a, w, alloc, sat(s))
    }
    import spark.implicits._
    out.toDF("source", "avail", "weight_ppm", "allocation", "saturated")
  }

  /** Exact integer square root as a column expression: the double `sqrt`
    * rounds to 1 ulp, which can land floor() one off an exact boundary —
    * the two CASE corrections pull it back, so isqrt(c)² ≤ c <
    * (isqrt(c)+1)² holds EXACTLY for any c in [0, 2^52] (above that the
    * double can be >1 off and the single-step correction no longer
    * covers; the callers' counts are far below). Engine-portable: the
    * oracle mirrors the same three steps, so both engines agree even
    * when their sqrt implementations round differently.
    */
  def isqrt(c: Column): Column = {
    val s0 = floor(sqrt(c.cast("double"))).cast("long")
    val s1 = s0 - when(s0 * s0 > c, 1L).otherwise(0L)
    s1 + when((s1 + 1L) * (s1 + 1L) <= c, 1L).otherwise(0L)
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * sampling rule of the mBERT/XLM-R family: sample source s with
    * probability ∝ c_s^α, α < 1 flattening the head so low-resource
    * sources are not drowned (α is 0.7 in mBERT, 0.3 in XLM-R). This op
    * pins α = 1/2 — the one exponent expressible EXACTLY in integer
    * arithmetic in both engines ([[isqrt]]); other α need floats whose
    * rounding the two engines disagree on (the same portability line
    * unigramSurprisal draws at floor-log2). Input is the PRE-AGGREGATED
    * (group, count) relation — counts of tokens, docs, or bytes, the
    * caller's notion of size.
    *
    * Shape at 100 TB: the input is group-sized (languages, sources) —
    * model-sized by construction; the total is one aggregate crossed
    * back. The corpus-sized work (counting) happens upstream where the
    * caller's one scan already is.
    *
    * Output: (groupCol, n (the input count), w = isqrt(n),
    * weight_ppm = (10⁶·w) div Σw).
    */
  def temperatureWeights(counts: DataFrame, groupCol: String,
                         countCol: String): DataFrame = {
    // fail fast on engine-divergent edges instead of silently diverging:
    // a negative count NULLs through isqrt's sqrt in Spark but is a
    // domain error elsewhere, and an all-zero weight total makes the
    // final `div` NULL in Spark vs a division-by-zero error in DuckDB's
    // `//`. Both are caller bugs (counts are sizes), so raise_error —
    // group-sized input, so the guard costs nothing.
    val guarded = counts.select(col(groupCol),
      when(col(countCol) < 0L, raise_error(concat(
        lit(s"temperatureWeights: negative $countCol for "),
        col(groupCol).cast("string")))).otherwise(col(countCol)).as("n"))
    val withW = guarded.select(col(groupCol), col("n"),
      isqrt(col("n")).as("w"))
    val tot = withW.agg(
      when(sum(col("w")) > 0L, sum(col("w")))
        .otherwise(raise_error(lit(
          "temperatureWeights: weight total is zero (all counts 0 or input empty)")))
        .as("_tot"))
    withW.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n"), col("w"),
        expr("(1000000 * w) div _tot").as("weight_ppm"))
  }
}
