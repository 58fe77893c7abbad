package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus construction.
  *
  * Everything here is a pure function of the row's id — no RNG state, no
  * `rand()` — so a sample is reproducible across runs, engines, and
  * cluster sizes, and a row's membership can be audited after the fact
  * (the property that matters when a training mix has to be rebuilt
  * bit-identically months later). Rate-based sampling with the same
  * hash trick lives in [[TextAnalysis.mixSources]]; this file covers
  * the exact-count variants.
  */
object Sampling {

  /** Uniform hash bucket in [0, 10000) as a pure function of the id —
    * the first 8 hex chars of md5, the same keyspace split used by
    * `q_train_val_split` and [[TextAnalysis.mixSources]].
    */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 10000

  /** Exactly `n` rows per stratum, deterministically: rank rows within
    * each stratum by (md5 hash bucket, id) and keep the first `n`.
    * Strata with fewer than `n` rows are kept whole.
    *
    * Scale shape: the rank-filter plans as `WindowGroupLimit`
    * (PlanAuditSpec pins it) — every map task pre-prunes to its local
    * top-`n` per stratum BEFORE the shuffle, so the exchange carries at
    * most `n × tasks` rows per stratum instead of the whole stratum. A
    * 100 TB stratum therefore never funnels through one reducer; only
    * the candidate set does. No driver-side counts, no two-phase rate
    * guessing, no failure mode when a stratum is small.
    */
  def stratifiedExact(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val w = Window.partitionBy(col(stratumCol)).orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= n)
  }

  /** Deterministic global shuffle for training-data sharding: every row
    * gets a `shard` in [0, nShards) and a dense `pos` within its shard,
    * both pure functions of (seed, id) — the shuffle a training run
    * needs before sequence packing, reproducible bit-identically months
    * later from the same ids and auditable per row. Different seeds
    * give independent permutations (epoch reshuffling without moving
    * data).
    *
    * Scale shape: one hash projection plus a rank window PER SHARD —
    * shards are the parallelism unit, so no global total order is ever
    * materialized; writing shard files is then a partitioned write on
    * `shard`. The within-shard sort is the price of a dense position
    * column; at 100 TB each shard sorts ~1/nShards of the corpus.
    */
  /** Weight-proportional sample of `k` rows WITHOUT replacement —
    * priority sampling (Duffield, Lund & Thorup, JACM 2007): each row
    * draws a deterministic uniform u from its id and gets priority
    * q = w/u; the k highest-priority rows are the sample. Inclusion
    * probability ≈ min(1, w/τ) with τ the (k+1)-th priority — the
    * near-optimal variance subset-sum estimator, and the standard way
    * to bias a training mix toward long/high-quality documents without
    * resorting to replacement draws.
    *
    * Engine-exactness: priorities avoid transcendentals on purpose —
    * u is a 60-bit md5 integer and q = w/u is ONE IEEE division, which
    * every engine rounds identically, so an oracle replays the exact
    * selection (pow/log-based Efraimidis–Spirakis keys can differ in
    * the last ulp across libm implementations and flip rank-k ties).
    *
    * Scale shape: one hash projection + a global top-k, which plans as
    * `TakeOrderedAndProject` — each task keeps its local k, the driver
    * merges task heads; no global sort, no single-reducer funnel.
    */
  def prioritySample(
      df: DataFrame,
      idCol: String,
      weightCol: Column,
      k: Int,
      seed: String = ""): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val u = conv(
      substring(md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long") + 1 // [1, 2^60]: never zero, division total
    df.withColumn("priority", weightCol.cast("double") / u.cast("double"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  def shardShuffle(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      seed: String = ""): DataFrame = {
    require(nShards > 0, s"shard count must be positive, got $nShards")
    // 15 hex chars = 60 bits: collision-free permutation keys far past
    // billion-row corpora (8 chars' 32-bit keyspace started colliding
    // ~100k ids, degrading within-shard order to id-order among
    // collided rows); 15 stays under Long.MaxValue so the signed cast
    // is exact
    val h = conv(
      substring(md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("shuffle_key"), col(idCol))
    df.withColumn("shuffle_key", h)
      .withColumn("shard", (col("shuffle_key") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** CURRICULUM sampling by score decile: rank every row into a decile
    * of `scoreCol` and keep a deterministically-hashed fraction that
    * RISES with the decile — rate (d+1)/10, so the top decile is kept
    * whole and the bottom at 10% — the standard quality/length-biased
    * mix a curriculum schedule draws from.
    *
    * Decile assignment uses EXACT global quantile boundaries (one tiny
    * aggregate; `percentile` matches DuckDB `quantile_cont` bit for
    * bit), broadcast as 9 plan literals: decile = #{boundaries strictly
    * below score}. NOT `ntile()` — a global ntile is a single-partition
    * window (one reducer owns the corpus), while boundary-compare is a
    * map-only projection after a 9-double collect. Membership is the
    * md5 [[hashBucket]] rule, so the sample is reproducible and
    * auditable row-by-row like every sampler here.
    */
  def curriculumByDecile(
      df: DataFrame,
      idCol: String,
      scoreCol: String): DataFrame = {
    val probs = (1 to 9).map(_ / 10.0)
    val bounds = df
      .agg(expr(s"percentile($scoreCol, array(${probs.mkString(", ")}))"))
      .head().getSeq[Double](0)
    val decile = bounds
      .map(b => when(col(scoreCol) > lit(b), 1).otherwise(0))
      .reduceLeft(_ + _)
    df.withColumn("decile", decile)
      .filter(hashBucket(col(idCol)) < (col("decile") + 1) * 1000)
  }
}
