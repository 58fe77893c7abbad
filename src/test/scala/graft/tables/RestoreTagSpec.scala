package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RESTORE (rollback as a new version) and snapshot TAGS (named refs
  * that pin retention).
  */
class RestoreTagSpec extends SparkSpec {
  import spark.implicits._

  test("restore republishes a historical snapshot with zero data copy; history survives") {
    val t = LakeTable(spark, scratchDir("restore"))
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    t.overwrite(Seq((9, "z")).toDF("id", "v")) // destructive v2
    val restored = t.restore(1L)
    assert(restored == 3L)
    assert(t.read().orderBy("id").collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // full history still time-travels
    assert(t.read(versionAsOf = Some(0L)).count() == 2)
    assert(t.read(versionAsOf = Some(2L)).collect().map(_.getInt(0)).toSeq == Seq(9))
    // restoring a nonexistent version fails loudly
    intercept[Exception] { t.restore(99L) }
  }

  test("restore reverts the incremental watermark but keeps the txn ledger") {
    val mk = (s: String) => java.sql.Timestamp.valueOf(s)
    val t = LakeTable(spark, scratchDir("restorewm"))
    t.append(Seq((1, mk("2024-01-01 00:00:00"))).toDF("id", "ts"), statsCols = Seq("ts"))
    t.append(Seq((2, mk("2024-02-01 00:00:00"))).toDF("id", "ts"), statsCols = Seq("ts"))
    // before restore the Feb row is "seen": incremental probe skips it
    val feb = Seq((2, mk("2024-02-01 00:00:00"))).toDF("id", "ts")
    assert(t.incrementalFrom(feb, "ts").isEmpty)
    t.restore(0L)
    // rolled away -> no longer seen -> re-ingestable
    assert(t.incrementalFrom(feb, "ts").count() == 1)
  }

  test("write-audit-publish: staged batches are invisible until the atomic publish") {
    val t = LakeTable(spark, scratchDir("wap"))
    t.append(Seq((1, 10.0)).toDF("id", "v"))
    val staged = t.stageAppend(Seq((2, 20.0), (3, -1.0)).toDF("id", "v"))
    // invisible to readers and to time travel while staged
    assert(t.read().count() == 1)
    assert(t.latestVersion().contains(0L))
    // the audit sees exactly the would-be-published rows
    assert(t.readStaged(staged).orderBy("id").collect().map(_.getInt(0)).toSeq == Seq(2, 3))
    t.publishStaged(staged)
    assert(t.read().count() == 3)
    // an aborted stage leaves no trace
    val bad = t.stageAppend(Seq((9, -9.0)).toDF("id", "v"))
    t.abortStaged(bad)
    assert(t.read().count() == 3)
    assert(t.sweepOrphans(graceMs = 0L).isEmpty, "abort must have reclaimed the dir itself")
  }

  test("tags pin snapshots through retention; deleting the tag releases them") {
    val t = LakeTable(spark, scratchDir("tags"))
    t.append(Seq((1, "a")).toDF("id", "v")) // v0
    t.createTag("golden")
    t.append(Seq((2, "b")).toDF("id", "v")) // v1
    t.append(Seq((3, "c")).toDF("id", "v")) // v2
    assert(t.listTags() == Seq(("golden", 0L)))
    val removed = t.expireSnapshots(keepLast = 1)
    // v1 expired; v0 pinned by the tag, still readable by name and version
    assert(t.readTag("golden").collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(t.read(versionAsOf = Some(0L)).count() == 1)
    intercept[Exception] { t.read(versionAsOf = Some(1L)) }
    assert(removed >= 0)
    // duplicate tag names are rejected; release + expire reclaims
    intercept[IllegalStateException] { t.createTag("golden") }
    t.deleteTag("golden")
    t.expireSnapshots(keepLast = 1)
    intercept[Exception] { t.read(versionAsOf = Some(0L)) }
    assert(t.read().count() == 3)
  }
}
