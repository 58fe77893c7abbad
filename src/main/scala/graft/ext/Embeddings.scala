package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding storage transforms — the compression layer of a vector
  * corpus. At 100 TB an fp32 embedding column is routinely the largest
  * column in the table; symmetric int8 quantization cuts it 4× with a
  * bounded reconstruction error (≤ scale/2 per component), which is the
  * standard trade accepted by FAISS-style `SQ8` storage. All pure column
  * algebra over higher-order functions: a single map stage, no shuffle,
  * stays inside whole-stage codegen.
  */
object Embeddings {

  /** Per-vector symmetric scale: max |v_i| / 127 (0.0 for the zero
    * vector — quantization then maps every component to 0).
    */
  def int8Scale(vec: Column): Column = {
    val m = array_max(transform(vec, x => abs(x.cast("double"))))
    coalesce(m, lit(0.0)) / 127.0
  }

  /** Symmetric int8 quantization: q_i = floor(v_i / scale + 0.5)
    * clamped to [-127, 127]. `floor(x + 0.5)` (round-half-up) instead of
    * `round()` so the arithmetic is reproducible verbatim in any engine
    * with floor — round() semantics on negative halves differ across
    * engines, floor does not.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0))
        .otherwise(
          greatest(lit(-127), least(lit(127), floor(x.cast("double") / scale + 0.5)))
            .cast("int")))

  /** Max absolute reconstruction error of the quantized vector —
    * the per-vector quality audit column (bounded by scale/2 up to the
    * clamp, which only binds at |v_i| = max|v|).
    */
  def maxAbsError(vec: Column, quant: Column, scale: Column): Column =
    coalesce(
      array_max(zip_with(vec, quant, (v, q) => abs(v.cast("double") - q * scale))),
      lit(0.0))

  /** Per-group element-wise centroids — the k-means / IVF-training
    * update step. Scale shape: posexplode to (group, dim, value), one
    * hash aggregation with map-side combine (the shuffle carries at
    * most |groups|·dim partial rows per task, NEVER vectors), then a
    * |groups|-sized re-assembly. The collect_list runs over exactly
    * `dim` rows per group — no vector list is ever gathered. Components
    * are summed as integer-scaled exact values (4-dp fixed point), so
    * the result is independent of partial-aggregation order — float
    * vector sums are not reproducible across engines or even runs.
    *
    * The 4-dp mean itself is rounded in INTEGER arithmetic
    * (half-away-from-zero on the exact rational s/n), not with a float
    * `round(x, 4)`: s/(n·10⁴) lands exactly on a 5th-decimal ".5"
    * whenever 2s ≡ 50 (mod 100·n-factor), where decimal-string rounding
    * (Spark's BigDecimal-of-shortest-repr) and binary rounding
    * (std::round) systematically disagree.
    *
    * Output: (groupCol, n_vectors, centroid: array<double> at 4dp).
    */
  def groupCentroids(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      vecCol: String): org.apache.spark.sql.DataFrame =
    groupCentroidComponents(df, groupCol, vecCol)
      .groupBy(col(groupCol))
      .agg(
        max(col("n")).as("n_vectors"),
        transform(
          sort_array(collect_list(struct(col("dim"), col("c")))),
          p => p.getField("c")).as("centroid"))

  /** The flat half of [[groupCentroids]]: one row per (group, dim) with
    * the value count `n` and the exact 4-dp mean component `c` — the
    * shape to use when the consumer wants scalar rows (result
    * verification, downstream joins on (group, dim)) rather than the
    * re-assembled vector.
    */
  def groupCentroidComponents(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      vecCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(groupCol), col("dim"))
      .agg(
        // count the VALUES, not the rows: a null component must not
        // deflate the mean of the present ones
        count(col("v")).as("n"),
        sum(expr("cast(round(cast(v as double) * 10000) as bigint)")).as("s"))
      // exact half-away-from-zero of s/n at integer precision (= the
      // centroid component in 1e-4 units); all-null dims yield NULL
      .withColumn(
        "c_e4",
        expr("CASE WHEN n = 0 THEN CAST(NULL AS BIGINT) " +
          "WHEN s >= 0 THEN (2 * s + n) DIV (2 * n) " +
          "ELSE -((-2 * s + n) DIV (2 * n)) END"))
      .withColumn("c", col("c_e4").cast("double") / 10000.0)
      .drop("s", "c_e4")
}
