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

  test("min/max serve from dir stats; uncovered columns and narrowed scopes fall back") {
    val cat = Catalog(spark, scratchDir("mmcat"))
    cat.createSchema("gold")
    val t = cat.table("gold", "mm")
    t.append((1 to 30).map(i => (i, i * 1.5)).toDF("id", "v"), statsCols = Seq("v"))
    t.append((31 to 40).map(i => (i, i * 1.5)).toDF("id", "v"), statsCols = Seq("v"))
    cat.attachSqlCatalog("lake")
    val mm = spark.sql("SELECT count(*) AS n, min(v) AS mn, max(v) AS mx FROM lake.gold.mm")
    assert(mm.as[(Long, Double, Double)].head() == ((40L, 1.5, 60.0)))
    val p = mm.queryExecution.executedPlan.toString
    assert(p.contains("MIN(v)") && p.contains("MAX(v)") && p.contains("COUNT(*)"),
      s"expected metadata-served aggregates:\n$p")

    // id has no recorded stats -> whole aggregation falls back, stays right
    val noStats = spark.sql("SELECT min(id) AS mn FROM lake.gold.mm")
    assert(noStats.head().getInt(0) == 1)
    assert(!noStats.queryExecution.executedPlan.toString.contains("MIN(id)"))

    // partition-scoped replace narrows a dir: stats are now WIDER than
    // the live rows, so serving them would be wrong — must fall back
    val pt = cat.table("gold", "mmp")
    pt.append(
      (1 to 20).map(i => (i, s"p${i % 2}", i * 1.0)).toDF("id", "p", "v"),
      partitionBy = Seq("p"), statsCols = Seq("v"))
    graft.tables.Merge.deleteWherePartitioned(pt, col("p") === "p1", "p")
    val narrowed = spark.sql("SELECT min(v) AS mn, max(v) AS mx FROM lake.gold.mmp")
    assert(!narrowed.queryExecution.executedPlan.toString.contains("MIN(v)"))
    // survivors are the even ids: min 2.0, max 20.0
    assert(narrowed.as[(Double, Double)].head() == ((2.0, 20.0)))
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

  test("GROUP BY the partition column serves per-dir footer counts; fallbacks stay exact") {
    val cat = Catalog(spark, scratchDir("gbycat"))
    cat.createSchema("gold")
    val t = cat.table("gold", "gby")
    // two commit dirs, int partition values, skewed group sizes
    t.append((1 to 30).map(i => (i, i % 3, s"r$i")).toDF("id", "p", "s"),
      partitionBy = Seq("p"))
    t.append((31 to 40).map(i => (i, i % 2, s"r$i")).toDF("id", "p", "s"),
      partitionBy = Seq("p"))
    cat.attachSqlCatalog("lake")

    val gby = spark.sql("SELECT p, count(*) AS n FROM lake.gold.gby GROUP BY p")
    val plan = gby.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*)]"),
      s"group-by-partition count must serve from metadata:\n$plan")
    assert(gby.as[(Int, Long)].collect().toSet ==
      Set((0, 15L), (1, 15L), (2, 10L)))

    // a filter means per-group counts are post-filter — must scan
    val filtered =
      spark.sql("SELECT p, count(*) AS n FROM lake.gold.gby WHERE id > 35 GROUP BY p")
    assert(!servedFromMetadata(filtered))
    assert(filtered.as[(Int, Long)].collect().toSet == Set((0, 3L), (1, 2L)))

    // grouping by a NON-partition key can't come from the dir layout
    val byS = spark.sql("SELECT s, count(*) AS n FROM lake.gold.gby GROUP BY s")
    assert(!servedFromMetadata(byS))
    assert(byS.count() == 40)

    // count(s) counts non-nulls, not rows — must scan
    val countCol = spark.sql("SELECT p, count(s) AS n FROM lake.gold.gby GROUP BY p")
    assert(!servedFromMetadata(countCol))

    // deletion vectors invalidate footer counts — must scan, stay right
    t.deleteWhereDV(col("id") <= 10)
    val dv = spark.sql("SELECT p, count(*) AS n FROM lake.gold.gby GROUP BY p")
    assert(!servedFromMetadata(dv))
    assert(dv.as[(Int, Long)].collect().toMap.values.sum == 30L)
  }

  test("grouped MIN/MAX serve from footer stats with the counts; fallbacks stay exact") {
    val cat = Catalog(spark, scratchDir("gbymm"))
    cat.createSchema("gold")
    val t = cat.table("gold", "mm")
    // string col `s` must refuse (binary stats may truncate); long col
    // serves; group 2's `v` is ALL NULL and must serve NULL
    val rows = (1 to 30).map { i =>
      val v: java.lang.Long = if (i % 3 == 2) null else java.lang.Long.valueOf(i * 10L)
      (i, i % 3, v, s"r$i")
    }
    t.append(rows.take(20).toDF("id", "p", "v", "s"), partitionBy = Seq("p"))
    t.append(rows.drop(20).toDF("id", "p", "v", "s"), partitionBy = Seq("p"))
    cat.attachSqlCatalog("lake")

    val gby = spark.sql(
      "SELECT p, count(*) AS n, min(v) AS mn, max(v) AS mx, min(p) AS mp " +
        "FROM lake.gold.mm GROUP BY p")
    val plan = gby.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"grouped count+min/max must serve from metadata:\n$plan")
    val expected = rows.groupBy(_._2).map { case (k, rs) =>
      val vs = rs.flatMap(r => Option(r._3).map(_.longValue))
      (k, rs.size.toLong,
        if (vs.isEmpty) null else java.lang.Long.valueOf(vs.min),
        if (vs.isEmpty) null else java.lang.Long.valueOf(vs.max),
        k)
    }.toSet
    assert(gby.collect().map(r => (r.getInt(0), r.getLong(1),
      if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)),
      if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3)),
      r.getInt(4))).toSet == expected)

    // a string column refuses the serve (possible stats truncation)
    val str = spark.sql("SELECT p, min(s) AS mn FROM lake.gold.mm GROUP BY p")
    assert(!servedFromMetadata(str))
    assert(str.count() == 3)
    // a double column refuses too (NaN-unsafe footer stats)... via a
    // fresh table since mm has no double col
    val t2 = cat.table("gold", "mmd")
    t2.append(Seq((1, 0, 1.5), (2, 1, 2.5)).toDF("id", "p", "d"), partitionBy = Seq("p"))
    val dbl = spark.sql("SELECT p, max(d) AS mx FROM lake.gold.mmd GROUP BY p")
    assert(!servedFromMetadata(dbl))
    assert(dbl.count() == 2)
    // avg/sum can't come from footer stats — whole serve refuses
    val sum = spark.sql("SELECT p, count(*) AS n, sum(v) AS s FROM lake.gold.mm GROUP BY p")
    assert(!servedFromMetadata(sum))
  }

  test("partition-layout flip mid-history refuses the grouped serve, never the answer") {
    val cat = Catalog(spark, scratchDir("gbyflip"))
    cat.createSchema("gold")
    val t = cat.table("gold", "flip")
    // commit 0: UNPARTITIONED (no p0= layout); commit 1: partitioned.
    // The grouped metadata serve would silently count zero rows for the
    // first dir — it must fall back to a scan instead
    t.append((1 to 10).map(i => (i, i % 2, s"r$i")).toDF("id", "p", "s"))
    t.append((11 to 20).map(i => (i, i % 2, s"r$i")).toDF("id", "p", "s"),
      partitionBy = Seq("p"))
    cat.attachSqlCatalog("lake")
    val gby = spark.sql("SELECT p, count(*) AS n FROM lake.gold.flip GROUP BY p")
    assert(!servedFromMetadata(gby),
      s"mixed-layout history must not serve from dir names:\n${gby.queryExecution.executedPlan}")
    assert(gby.as[(Int, Long)].collect().toSet == Set((0, 10L), (1, 10L)))
    // global count(*) walks every file, so it still serves from metadata
    val cnt = spark.sql("SELECT count(*) AS n FROM lake.gold.flip")
    assert(cnt.head().getLong(0) == 20L)
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
