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

  /** HILBERT key of two non-negative dimensions on a 2^order × 2^order
    * grid — the space-filling curve behind Delta's Liquid-style
    * clustering choice over Morton: consecutive Hilbert keys are always
    * ADJACENT cells (a Morton walk jumps across the grid at power-of-two
    * boundaries), so equal-size key ranges cover tighter rectangles and
    * per-file zonemaps come out tighter on both dimensions.
    *
    * The classic xy→d loop (rotate-and-accumulate per bit level,
    * Hamilton's convention) is data-dependent per level, so unrolling it
    * into plain column algebra would duplicate the x/y subtrees ~3× per
    * level — an exponentially-sized plan. Instead the whole loop is ONE
    * `aggregate` fold over the literal level sequence with a
    * struct(d, x, y) accumulator: plan size linear in `order`, evaluated
    * iteratively per row. A higher-order function sits outside
    * whole-stage codegen, but 16 fold steps per row is noise next to
    * the shuffle the clustered rewrite performs anyway.
    */
  def hilbertKey(a: Column, b: Column, order: Int = 16): Column = {
    require(order >= 1 && order <= 31, s"hilbert order must be in [1,31], got $order")
    val mask = (1L << order) - 1
    // fold over the literal per-level cell sizes s = 2^(order-1) … 1, so
    // the lambda needs no variable-amount shift at all
    val levels = array(((order - 1) to 0 by -1).map(i => lit(1L << i)): _*)
    aggregate(
      levels,
      struct(
        lit(0L).as("d"),
        a.cast("long").bitwiseAND(lit(mask)).as("x"),
        b.cast("long").bitwiseAND(lit(mask)).as("y")),
      (acc, s) => {
        val x = acc.getField("x")
        val y = acc.getField("y")
        val rx = when(x.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
        val ry = when(y.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
        val nd = acc.getField("d") + s * s * (rx * 3).bitwiseXOR(ry)
        // Hamilton rotation: negate-if-rx then swap, skipped when ry=1
        val nx = when(ry > 0, x).otherwise(when(rx > 0, s - 1 - y).otherwise(y))
        val ny = when(ry > 0, y).otherwise(when(rx > 0, s - 1 - x).otherwise(x))
        struct(nd.as("d"), nx.as("x"), ny.as("y"))
      },
      acc => acc.getField("d"))
  }
}
