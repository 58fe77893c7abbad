package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** COUNT(*) aggregate pushdown through the DSv2 catalog: a bare count
  * is served from parquet footer metadata (no data scan); filters,
  * grouping, and deletion vectors all fall back to the real scan.
  */
class CountPushdownSpec extends SparkSpec {
  import spark.implicits._

  // the V1 bridge hides the inner parquet read, so the observable
  // marker is the pushed-aggregate annotation on the scan node
  private def servedFromMetadata(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("PushedAggregates: [COUNT(*)]")

  test("bare count(*) is metadata-only; filtered/grouped counts scan") {
    val cat = Catalog(spark, scratchDir("cntcat"))
    cat.createSchema("gold")
    val t = cat.table("gold", "cnt")
    t.append((1 to 30).map(i => (i, s"g${i % 3}")).toDF("id", "g"))
    t.append((31 to 45).map(i => (i, s"g${i % 3}")).toDF("id", "g"))
    cat.attachSqlCatalog("lake")

    val bare = spark.sql("SELECT count(*) AS n FROM lake.gold.cnt")
    assert(bare.head().getLong(0) == 45L)
    assert(servedFromMetadata(bare), s"count(*) must serve from metadata:\n${bare.queryExecution.executedPlan}")

    // a filter means the count is post-filter — must scan
    val filtered = spark.sql("SELECT count(*) AS n FROM lake.gold.cnt WHERE id > 40")
    assert(filtered.head().getLong(0) == 5L)
    assert(!servedFromMetadata(filtered))

    // grouped counts aren't the manifest count — must scan
    val grouped = spark.sql("SELECT g, count(*) AS n FROM lake.gold.cnt GROUP BY g")
    assert(grouped.count() == 3)
    assert(!servedFromMetadata(grouped))

    // count over a partitioned + scope-narrowed table stays exact
    val pt = cat.table("gold", "cntp")
    pt.append((1 to 20).map(i => (i, s"p${i % 4}")).toDF("id", "p"), partitionBy = Seq("p"))
    graft.tables.Merge.deleteWherePartitioned(pt, col("p") === "p1", "p")
    val pcount = spark.sql("SELECT count(*) AS n FROM lake.gold.cntp")
    assert(pcount.head().getLong(0) == 15L)
    assert(servedFromMetadata(pcount))
  }

  test("deletion vectors disable the metadata count but never the answer") {
    val cat = Catalog(spark, scratchDir("cntdv"))
    cat.createSchema("gold")
    val t = cat.table("gold", "cntdv")
    t.append((1 to 20).map(i => (i, i * 2)).toDF("id", "v"))
    t.deleteWhereDV(col("id") <= 5)
    cat.attachSqlCatalog("lake")
    val c = spark.sql("SELECT count(*) AS n FROM lake.gold.cntdv")
    assert(c.head().getLong(0) == 15L)
    assert(!servedFromMetadata(c), "DV table must fall back to a real scan")
  }

  test("time-traveled count reads the pinned snapshot's metadata") {
    val cat = Catalog(spark, scratchDir("cnttt"))
    cat.createSchema("gold")
    val t = cat.table("gold", "cnttt")
    t.append((1 to 10).map(i => (i, i)).toDF("id", "v"))
    t.append((11 to 25).map(i => (i, i)).toDF("id", "v"))
    cat.attachSqlCatalog("lake")
    val v0 = spark.sql("SELECT count(*) AS n FROM lake.gold.cnttt VERSION AS OF 0")
    assert(v0.head().getLong(0) == 10L)
    assert(servedFromMetadata(v0))
    assert(spark.sql("SELECT count(*) FROM lake.gold.cnttt").head().getLong(0) == 25L)
  }
}
