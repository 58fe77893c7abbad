package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedMergeSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2020-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2020-02-01 00:00:00")

  private def seed = Seq(
    ("k1", 10L, 2023), ("k2", 20L, 2023),
    ("k3", 30L, 2024), ("k4", 40L, 2024),
    ("k5", 50L, 2025)).toDF("key", "v", "year")

  test("partitioned SCD1 rewrites only affected partitions; untouched files survive verbatim") {
    val table = LakeTable(spark, scratchDir("pmerge1"))
    Merge.mergeScd1Partitioned(table, seed, Seq("key"), "year")

    // record the physical files of the untouched 2023 partition
    def files2023() = {
      import scala.jdk.CollectionConverters._
      val dataDir = java.nio.file.Paths.get(table.root, "data")
      java.nio.file.Files.walk(dataDir).iterator().asScala
        .filter(p => p.toString.contains("year=2023") && p.toString.endsWith(".parquet"))
        .map(_.toString).toSet
    }
    val before2023 = files2023()

    // update one 2024 key + insert a new 2025 key: 2024 and 2025 rewrite, 2023 must not
    val batch2 = Seq(("k3", 99L, 2024), ("k6", 60L, 2025)).toDF("key", "v", "year")
    Merge.mergeScd1Partitioned(table, batch2, Seq("key"), "year")

    val rows = table.read().orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(rows == Seq(
      ("k1", 10L, 2023), ("k2", 20L, 2023),
      ("k3", 99L, 2024), ("k4", 40L, 2024),
      ("k5", 50L, 2025), ("k6", 60L, 2025)))

    assert(files2023() == before2023, "2023 partition files must be untouched")
    // partition pruning still works through narrowed scopes
    assert(table.read().filter($"year" === 2024).count() == 2)
    // time travel across the scoped commit still works
    assert(table.read(versionAsOf = Some(0L)).count() == 5)
  }

  test("plain append to a partitioned table conforms to its layout; scoped merge keeps its rows") {
    // The ADVICE r1 data-loss scenario: append(df) with no partitionBy on a
    // partitioned table, then a partition-scoped merge. The appended commit
    // must be Hive-partitioned (so it can be scope-narrowed) and its rows
    // outside the affected partitions must survive.
    val table = LakeTable(spark, scratchDir("pmerge3"))
    Merge.mergeScd1Partitioned(table, seed, Seq("key"), "year")
    table.append(Seq(("k7", 70L, 2023), ("k8", 80L, 2025)).toDF("key", "v", "year"))

    val batch = Seq(("k8", 81L, 2025)).toDF("key", "v", "year") // touches 2025 only
    Merge.mergeScd1Partitioned(table, batch, Seq("key"), "year")

    val rows = table.read().orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(rows == Seq(
      ("k1", 10L, 2023), ("k2", 20L, 2023),
      ("k3", 30L, 2024), ("k4", 40L, 2024),
      ("k5", 50L, 2025), ("k7", 70L, 2023), ("k8", 81L, 2025)))
  }

  test("merge rejects NULL and dir-unsafe partition values instead of silently skipping them") {
    val table = LakeTable(spark, scratchDir("pmerge4"))
    Merge.mergeScd1Partitioned(table, Seq(("k1", 1L, "2023")).toDF("key", "v", "part"),
      Seq("key"), "part")
    intercept[IllegalArgumentException] {
      Merge.mergeScd1Partitioned(
        table,
        Seq(("k2", 2L, null.asInstanceOf[String])).toDF("key", "v", "part"),
        Seq("key"), "part")
    }
    intercept[IllegalArgumentException] {
      Merge.mergeScd1Partitioned(
        table, Seq(("k3", 3L, "a/b")).toDF("key", "v", "part"), Seq("key"), "part")
    }
    // '#' is Hive-escaped too (%23) — the guard must use Spark's own escaper
    intercept[IllegalArgumentException] {
      Merge.mergeScd1Partitioned(
        table, Seq(("k4", 4L, "room#1")).toDF("key", "v", "part"), Seq("key"), "part")
    }
    // deletes share the same guard
    intercept[IllegalArgumentException] {
      Merge.deleteWherePartitioned(
        LakeTable(spark, scratchDir("pdel-unsafe")) match { case t =>
          t.append(Seq(("k1", 1L, "50%")).toDF("key", "v", "part"), partitionBy = Seq("part")); t
        },
        col("v") >= 0L,
        "part")
    }
  }

  test("partitioned DELETE rewrites matched partitions; a fully-deleted partition vanishes") {
    val table = LakeTable(spark, scratchDir("pdel"))
    table.append(seed, partitionBy = Seq("year"))
    def files2023() = {
      import scala.jdk.CollectionConverters._
      val dataDir = java.nio.file.Paths.get(table.root, "data")
      java.nio.file.Files.walk(dataDir).iterator().asScala
        .filter(p => p.toString.contains("year=2023") && p.toString.endsWith(".parquet"))
        .map(_.toString).toSet
    }
    val before2023 = files2023()

    // whole 2025 partition goes; 2024 partially rewritten; 2023 untouched
    Merge.deleteWherePartitioned(table, col("year") === 2025 || col("key") === "k3", "year")
    val rows = table.read().orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(rows == Seq(("k1", 10L, 2023), ("k2", 20L, 2023), ("k4", 40L, 2024)))
    assert(files2023() == before2023, "2023 partition files must be untouched")
    assert(table.read(versionAsOf = Some(0L)).count() == 5) // time travel intact
  }

  test("expireSnapshots deletes unreferenced commit dirs and keeps recent versions readable") {
    val table = LakeTable(spark, scratchDir("expire"))
    table.append(seed, partitionBy = Seq("year"))
    table.overwrite(seed.filter($"year" =!= 2025), Seq("year")) // v1 orphans v0's dir? no — v0's dir dropped from v1
    table.append(Seq(("k9", 90L, 2025)).toDF("key", "v", "year"))
    assert(table.snapshots().count() == 3)
    val deleted = table.expireSnapshots(keepLast = 2)
    assert(deleted == 1, s"expected v0's sole dir deleted, got $deleted")
    // latest two versions still read correctly
    assert(table.read().count() == 5)
    assert(table.read(versionAsOf = Some(1L)).count() == 4)
    // the expired version is gone
    intercept[Exception] { table.read(versionAsOf = Some(0L)).collect() }
  }

  test("partitioned SCD2 keeps three-way semantics and leaves other partitions alone") {
    val table = LakeTable(spark, scratchDir("pmerge2"))
    Merge.mergeScd2Partitioned(table, seed, Seq("key"), Seq("v"), t1, "year")

    // change k3 (2024), resend k4 unchanged, new k6 (2025); 2023 untouched
    val batch2 = Seq(("k3", 31L, 2024), ("k4", 40L, 2024), ("k6", 60L, 2025))
      .toDF("key", "v", "year")
    Merge.mergeScd2Partitioned(table, batch2, Seq("key"), Seq("v"), t2, "year")

    val all = table.read()
    assert(all.count() == 7) // 5 + closed k3's new version + k6
    val k3 = all.filter($"key" === "k3").orderBy("start_timestamp").collect()
    assert(k3.length == 2)
    assert(k3(0).getAs[Int]("is_current") == 0 && k3(0).getAs[Timestamp]("end_timestamp") == t2)
    assert(k3(1).getAs[Int]("is_current") == 1 && k3(1).getAs[Long]("v") == 31L)
    assert(all.filter($"key" === "k4").count() == 1) // unchanged -> skipped
    assert(all.filter($"key" === "k1" && $"is_current" === 1).count() == 1)
    val maxCurrent = all.filter($"is_current" === 1)
      .groupBy("key").count().agg(max("count")).head().getLong(0)
    assert(maxCurrent == 1L)
  }

  test("affected-partition enumeration is capped loudly at the boundary") {
    val table = LakeTable(spark, scratchDir("pmergecap"))
    Merge.mergeScd1Partitioned(table, seed, Seq("key"), "year") // 3 partitions
    spark.conf.set(Merge.MaxAffectedPartitionsKey, "3")
    try {
      // exactly at the cap (3 distinct years) still merges fine
      Merge.mergeScd1Partitioned(
        table,
        Seq(("k1", 11L, 2023), ("k3", 31L, 2024), ("k5", 51L, 2025)).toDF("key", "v", "year"),
        Seq("key"), "year")
      assert(table.read().filter($"v" % 10 === 1).count() == 3)
      // one past the cap fails loudly, pointing at the whole-table path
      val e = intercept[IllegalArgumentException] {
        Merge.mergeScd1Partitioned(
          table,
          Seq(("k1", 12L, 2023), ("k3", 32L, 2024), ("k5", 52L, 2025), ("k9", 90L, 2026))
            .toDF("key", "v", "year"),
          Seq("key"), "year")
      }
      assert(e.getMessage.contains("whole-table"), e.getMessage)
      assert(table.read().filter($"v" === 12L).count() == 0, "failed merge must not publish")
      // deleteWherePartitioned shares the cap
      val e2 = intercept[IllegalArgumentException] {
        spark.conf.set(Merge.MaxAffectedPartitionsKey, "2")
        Merge.deleteWherePartitioned(table, $"v" > 0, "year")
      }
      assert(e2.getMessage.contains(Merge.MaxAffectedPartitionsKey), e2.getMessage)
    } finally spark.conf.unset(Merge.MaxAffectedPartitionsKey)
  }
}
