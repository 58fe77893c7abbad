package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** High-watermark incremental scans — the reference's hand-rolled
  * incremental view maintenance
  * (/root/reference/src/silver/_silver_utils.py:35-49,
  * /root/reference/src/gold/_gold_utils.py:27-46): take everything from
  * the source strictly newer than the newest row already in the target.
  *
  * The watermark is computed as a scalar aggregate on the driver before
  * planning the scan, so the source read plans with a plain literal
  * comparison — which pushes down to parquet row-group stats (and, when
  * the source is partitioned on date parts of the same column, prunes
  * whole partitions). The strict `>` is reference behavior and documented
  * risk (SURVEY §7.5.5): rows sharing the max timestamp across job runs
  * would be dropped; the reference avoids it by stamping a per-job
  * constant ingest_timestamp.
  */
object Incremental {

  /** Source rows with `srcTs` strictly greater than max(`tgtTs`) in
    * `target`; the full source when the target is empty or all-null.
    */
  def highWatermark(
      source: DataFrame,
      target: DataFrame,
      srcTs: String,
      tgtTs: String): DataFrame = {
    // one probe job, not two: max over an empty target is NULL, so the
    // null check already covers the empty-table case an isEmpty() probe
    // would cost a separate action to answer
    val hwm = target.agg(max(col(tgtTs))).head()
    if (hwm.isNullAt(0)) source
    else source.filter(col(srcTs) > lit(hwm.get(0)))
  }
}
