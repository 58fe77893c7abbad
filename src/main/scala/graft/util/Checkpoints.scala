package graft.util

import org.apache.spark.sql.DataFrame

object Checkpoints {

  /** Release the cached blocks behind an eager `localCheckpoint` once a
    * successor plan has materialized. A checkpointed Dataset's analyzed
    * plan IS a `LogicalRDD` over the locally-checkpointed RDD, so the
    * blocks are reachable (and releasable) through it; `unpersist` on
    * the Dataset itself would be a no-op because the cache manager
    * never tracked it. Iterative algorithms (BPE rounds, label
    * propagation) call this on round N−1 after round N checkpoints, so
    * executor storage stays O(one round), not O(rounds).
    */
  def releaseLocal(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
