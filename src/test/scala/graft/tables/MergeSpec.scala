package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2020-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2020-02-01 00:00:00")
  private val t3 = Timestamp.valueOf("2020-03-01 00:00:00")

  test("SCD2 three-way outcome: changed closes+inserts, unchanged skips, new inserts") {
    val table = LakeTable(spark, scratchDir("scd2"))
    val b1 = Seq(("k1", 10L), ("k2", 20L)).toDF("key", "shares")
    Merge.mergeScd2(table, b1, Seq("key"), Seq("shares"), t1)

    val b2 = Seq(("k1", 11L), ("k2", 20L), ("k3", 30L)).toDF("key", "shares")
    Merge.mergeScd2(table, b2, Seq("key"), Seq("shares"), t2)

    val rows = table.read().orderBy("key", "start_timestamp").collect()
    val asTuples = rows.map(r =>
      (r.getAs[String]("key"), r.getAs[Long]("shares"),
        r.getAs[Timestamp]("start_timestamp"), Option(r.getAs[Timestamp]("end_timestamp")),
        r.getAs[Int]("is_current"))).toSeq
    assert(asTuples == Seq(
      ("k1", 10L, t1, Some(t2), 0), // closed old version
      ("k1", 11L, t2, None, 1),     // new open version
      ("k2", 20L, t1, None, 1),     // unchanged -> untouched, no duplicate
      ("k3", 30L, t2, None, 1)))    // brand-new key
  }

  test("SCD2 invariants: replay is a no-op; ≤1 current row per key; null-safe tracking") {
    val table = LakeTable(spark, scratchDir("scd2b"))
    val b = Seq(("k1", Some(1L)), ("k2", None)).toDF("key", "shares")
    Merge.mergeScd2(table, b, Seq("key"), Seq("shares"), t1)
    val v1 = table.latestVersion().get
    Merge.mergeScd2(table, b, Seq("key"), Seq("shares"), t2) // identical replay
    assert(table.read().count() == 2) // no new versions (null-safe compare on None)
    // NULL -> value transition is a real change
    Merge.mergeScd2(table, Seq(("k2", Some(5L))).toDF("key", "shares"), Seq("key"), Seq("shares"), t3)
    val k2 = table.read().filter($"key" === "k2").orderBy("start_timestamp").collect()
    assert(k2.length == 2 && k2(0).getAs[Int]("is_current") == 0 && k2(1).getAs[Int]("is_current") == 1)
    val perKeyCurrent = table.read().filter($"is_current" === 1)
      .groupBy("key").count().agg(max("count")).head().getLong(0)
    assert(perKeyCurrent == 1L)
    assert(v1 >= 0)
  }

  test("SCD1 upsert: matched rows replaced, unmatched survive, new keys insert") {
    val table = LakeTable(spark, scratchDir("scd1"))
    Merge.mergeScd1(table, Seq(("a", 1), ("b", 2)).toDF("key", "v"), Seq("key"))
    Merge.mergeScd1(table, Seq(("b", 99), ("c", 3)).toDF("key", "v"), Seq("key"))
    val out = table.read().orderBy("key").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(out == Seq(("a", 1), ("b", 99), ("c", 3)))
  }

  test("SCD1 evolve: added columns NULL-fill survivors; dropped columns retained on matches, NULL on inserts") {
    val table = LakeTable(spark, scratchDir("scd1evolve"))
    Merge.mergeScd1Evolve(
      table, Seq(("a", 1, "na"), ("b", 2, "nb")).toDF("key", "v", "name"), Seq("key"))
    // drifted source: no `name`, new `tag`
    Merge.mergeScd1Evolve(
      table, Seq(("b", 99, "tb"), ("c", 3, "tc")).toDF("key", "v", "tag"), Seq("key"))
    val out = table.read()
      .select($"key", $"v", $"name", $"tag")
      .as[(String, Int, Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("a", 1, Some("na"), None), // untouched: keeps name, NULL new col
      ("b", 99, Some("nb"), Some("tb")), // matched: source v+tag, retained name
      ("c", 3, None, Some("tc")))) // inserted: no name to retain
    // identical-schema second merge still behaves as plain SCD1
    Merge.mergeScd1Evolve(
      table, Seq(("a", 7, "NA", "ta")).toDF("key", "v", "name", "tag"), Seq("key"))
    val a = table.read().filter($"key" === "a")
      .select($"v", $"name", $"tag").as[(Int, String, String)].head()
    assert(a == ((7, "NA", "ta")))
  }
}
