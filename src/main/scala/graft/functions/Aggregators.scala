package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (`Aggregator`) — the UDAF surface SURVEY
  * §7.4 plans for engine extensions. An Aggregator merges partial
  * states map-side before the shuffle (same contract as built-in
  * declarative aggregates), so it scales like `sum`, not like a
  * collect-and-fold.
  */
object Aggregators {

  /** (weighted sum, weight sum) running state. */
  final case class WAvgState(num: Double, den: Double)

  /** Weighted average of `value` by `weight`: Σ(v·w) / Σ(w); NULL-free
    * input assumed (filter first). Deterministic up to FP addition
    * order — oracle comparisons round.
    */
  object WeightedAvg extends Aggregator[(Double, Double), WAvgState, Double] {
    override def zero: WAvgState = WAvgState(0.0, 0.0)
    override def reduce(s: WAvgState, in: (Double, Double)): WAvgState =
      WAvgState(s.num + in._1 * in._2, s.den + in._2)
    override def merge(a: WAvgState, b: WAvgState): WAvgState =
      WAvgState(a.num + b.num, a.den + b.den)
    override def finish(s: WAvgState): Double = if (s.den == 0.0) 0.0 else s.num / s.den
    override def bufferEncoder: Encoder[WAvgState] = Encoders.product[WAvgState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
