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
}
