package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Column forms of Spark's OWN bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair the
  * optimizer's runtime-filter injection uses), surfaced for plans the
  * injection rule cannot see: iterative anti-joins whose build side is a
  * loop-carried cached frame with no stats (BFS visited sets, the
  * incremental-dedup corpus index).
  *
  * Contract (same as `InjectRuntimeFilter`): feed BOTH sides the same
  * `xxhash64(...)` column; the aggregate's binary result is collected to
  * the driver (n·~10 bits — MBs at 10⁷ items) and probed as a foldable
  * binary literal. `might_contain = false` is EXACT "never inserted";
  * `true` is "maybe" — callers must still verify positives, which is
  * what makes this a PRE-PRUNE of an anti-join, never a replacement. At
  * 10⁹-item build sides the literal should graduate to a broadcast
  * variable; the collected-blob form keeps the whole prune inside
  * ordinary column algebra.
  */
object Bloom {

  /** Largest bloom bit-count we'll materialize as a plan literal (8M
    * bytes = Spark's default `runtimeFilterNumBitsMax` ceiling, 64M
    * bits) — past this the filter saturates toward all-maybe instead of
    * growing, an fpp degradation, never a correctness loss.
    */
  val MaxNumBits: Long = 67108864L

  private def numBitsFor(estItems: Long): Long =
    math.min(MaxNumBits, math.max(1L << 20, estItems * 10L))

  /** Aggregate a pre-hashed (`xxhash64`) long column into a serialized
    * bloom filter (binary). Merge is bitwise-OR — associative and
    * map-side combined, so the shuffle carries one fixed-size bitset per
    * partition regardless of row count (the same bounded-state argument
    * as every sketch in [[Sketches]]).
    */
  def bloomAgg(spark: SparkSession, hashed: Column, estItems: Long): Column = {
    val est = math.max(1L, estItems)
    val bits = numBitsFor(est)
    // One fixed registry name with est/bits passed as (foldable) argument
    // literals — re-registering per distinct (est, bits) pair would grow
    // the session FunctionRegistry without bound across repeated
    // bfsHops/incremental-dedup calls.
    val name = "graft_bloom_agg"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    call_function(
      name,
      hashed,
      org.apache.spark.sql.functions.lit(est),
      org.apache.spark.sql.functions.lit(bits))
  }

  /** Probe: `might_contain(bloomBlob, xxhash64(v))`. `bloom` must be
    * foldable (a `lit(blob)`); false ⇒ v was definitely never inserted.
    */
  def mightContain(spark: SparkSession, bloom: Column, hashed: Column): Column = {
    // DISTINCT registry name from VectorExprs.bloomMightContain's
    // graft_bloom_might_contain: the two builders have different key
    // contracts (pre-hashed BIGINT, NULL->NULL here vs raw key,
    // NULL->false there) and a shared name means whichever registered
    // last silently wins for any column analyzed afterward
    val name = "graft_bloom_might_contain_hashed"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
    call_function(name, bloom, hashed)
  }
}
