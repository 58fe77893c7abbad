package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Candlestick resampling: the reference's one stateful streaming
  * operator (/root/reference/src/silver/ohlcv_agg.py:17-38) — per-key
  * tumbling-window OHLCV aggregation — generalized and made
  * deterministic.
  *
  * The reference computes open/close with `first`/`last`, which are
  * arrival-order-dependent (it leans on Kafka per-key ordering). As
  * SURVEY §7.5.2 requires, this engine's documented variant picks
  * open/close by *event time* with a unique tie-breaker id:
  * `min(struct(ts, id, value))` is a lexicographic arg-min — an
  * associative, order-insensitive aggregate, so it is identical across
  * batch, streaming, and any shuffle order, and cheap (single partial
  * agg, no window sort).
  *
  * Works on both batch and streaming frames; for streaming, apply
  * `withWatermark` upstream (see [[StreamJobs]]).
  */
object Candles {

  /** Group by `keyCol` + a tumbling window over `tsCol`; emit
    * open/high/low/close/volume/n per candle with the window flattened
    * to `start_window`/`end_window` (reference A2 flatten,
    * ohlcv_agg.py:30-33).
    */
  def candles(
      df: DataFrame,
      tsCol: String,
      idCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String = "15 minutes"): DataFrame = {
    val pick: Column = struct(col(tsCol), col(idCol), col(valueCol))
    df.groupBy(col(keyCol), window(col(tsCol), windowDuration).as("w"))
      .agg(
        min(pick).getField(valueCol).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(pick).getField(valueCol).as("close"),
        sum(col(valueCol)).as("volume"),
        count(lit(1)).as("n_rows"))
      .select(
        col(keyCol),
        col("w.start").as("start_window"),
        col("w.end").as("end_window"),
        col("open"),
        col("high"),
        col("low"),
        col("close"),
        col("volume"),
        col("n_rows"))
  }

  /** Reference-faithful variant: open/close via `first`/`last`
    * (arrival-order-dependent, exactly like
    * /root/reference/src/silver/ohlcv_agg.py:22-27 which leans on Kafka
    * per-key ordering). Provided for behavioral parity; NOT used in
    * oracle checks — use [[candles]] (deterministic event-time picks)
    * for anything that must be reproducible. See SURVEY §7.5.2.
    */
  def candlesArrivalOrder(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String = "15 minutes"): DataFrame =
    df.groupBy(col(keyCol), window(col(tsCol), windowDuration).as("w"))
      .agg(
        first(col(valueCol)).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        last(col(valueCol)).as("close"),
        sum(col(valueCol)).as("volume"),
        count(lit(1)).as("n_rows"))
      .select(
        col(keyCol),
        col("w.start").as("start_window"),
        col("w.end").as("end_window"),
        col("open"),
        col("high"),
        col("low"),
        col("close"),
        col("volume"),
        col("n_rows"))

  /** Presentation projection shared by the batch query and the
    * streaming query's memory-sink output: string windows, rounded sum.
    */
  def present(cdl: DataFrame, keyCol: String): DataFrame =
    cdl.select(
      col(keyCol),
      date_format(col("start_window"), "yyyy-MM-dd HH:mm:ss").as("start_window"),
      date_format(col("end_window"), "yyyy-MM-dd HH:mm:ss").as("end_window"),
      col("open"),
      col("high"),
      col("low"),
      col("close"),
      round(col("volume"), 4).as("volume"),
      col("n_rows"))
}
