package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys as pure column algebra — the multi-dimension
  * clustering key behind Delta's `OPTIMIZE ... ZORDER BY` and Iceberg's
  * z-order sort rewrite. Interleaving the bits of two dimensions makes
  * rows close in EITHER dimension land close in the sort order, so a
  * range-clustered rewrite on the z-key gives per-file zonemaps that
  * are tight on BOTH columns — a query filtering on either one prunes
  * files, where a lexicographic (a, b) sort only ever prunes on `a`.
  *
  * Built entirely from `shiftleft`/`|`/`&` over longs (the classic
  * magic-number bit-spread), so the whole key stays inside whole-stage
  * codegen — no UDF, no custom Expression needed.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` to the even bit positions of a long
    * (0babab…a0b0 pattern half): 5 mask-shift rounds, each fully
    * codegen'd.
    */
  private def spreadBits(x: Column): Column = {
    val masks: Seq[(Int, Long)] = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL,
      2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)
    masks.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (acc, (shift, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, shift))).bitwiseAND(lit(mask))
    }
  }

  /** Morton key of two non-negative 32-bit dimensions: bits of `a` on
    * the odd positions, bits of `b` on the even ones. Callers with
    * wider/signed/continuous domains normalize first (rank, epoch-day,
    * bucket id — anything that preserves order in 32 bits).
    */
  def zorderKey(a: Column, b: Column): Column =
    shiftleft(spreadBits(a), 1).bitwiseOR(spreadBits(b))
}
