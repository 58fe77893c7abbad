package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.{Catalog, IncrementalAggView}

/** Transparent materialized-view routing: matching aggregates over the
  * registered source reroute to the view scan; staleness, time-travel
  * pins, and shape mismatches all fall through to the raw scan.
  */
class MatViewRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("fresh view serves the aggregate; stale view falls back; refresh re-enables") {
    MatViews.clear()
    val cat = Catalog(spark, scratchDir("mvcat"))
    cat.createSchema("gold")
    val t = cat.table("gold", "ev")
    val rows = (1 to 40).map(i => (i.toLong, s"t${i % 3}", i * 1.5))
    t.append(rows.filter(_._1 % 2 == 0).toDF("id", "typ", "v"))
    t.append(rows.filter(_._1 % 2 == 1).toDF("id", "typ", "v"))
    val v = IncrementalAggView(
      t, scratchDir("mvview"), Seq("typ"), Seq.empty, minMaxCols = Seq("v"))
    v.refresh()
    MatViews.register(MatViews.Spec(t, v, Seq("typ"), Seq("v")))
    cat.attachSqlCatalog("lake")

    val q = "SELECT typ, count(*) AS n, min(v) AS min_v, max(v) AS max_v " +
      "FROM lake.gold.ev GROUP BY typ"
    val served = spark.sql(q)
    val expected = rows.groupBy(_._2).map { case (k, rs) =>
      (k, rs.size.toLong, rs.map(_._3).min, rs.map(_._3).max)
    }.toSet
    assert(served.as[(String, Long, Double, Double)].collect().toSet == expected)
    // the optimized plan must scan the VIEW's lake table, not the source
    val p1 = planOf(served)
    assert(!p1.toLowerCase.contains("aggregate"), s"aggregate should be gone:\n$p1")
    assert(p1.contains("n_rows"), s"expected the view's state relation:\n$p1")
    assert(served.queryExecution.executedPlan.toString.contains("mvview"),
      s"executed scan must read the view files:\n${served.queryExecution.executedPlan}")

    // staleness: a new source commit the view hasn't absorbed
    t.append(Seq((100L, "t0", 999.0)).toDF("id", "typ", "v"))
    val stale = spark.sql(q)
    val p2 = planOf(stale)
    assert(p2.toLowerCase.contains("aggregate"), s"stale view must not serve:\n$p2")
    assert(stale.filter($"typ" === "t0").head().getDouble(3) == 999.0)

    // refresh absorbs the commit; routing resumes WITH the new row
    v.refresh()
    val again = spark.sql(q)
    assert(!planOf(again).toLowerCase.contains("aggregate"))
    assert(again.filter($"typ" === "t0").head().getDouble(3) == 999.0)
  }

  test("non-matching shapes and version-pinned scans never reroute") {
    MatViews.clear()
    val cat = Catalog(spark, scratchDir("mvcat2"))
    cat.createSchema("gold")
    val t = cat.table("gold", "ev2")
    t.append(Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "typ", "v"))
    val v = IncrementalAggView(
      t, scratchDir("mvview2"), Seq("typ"), Seq.empty, minMaxCols = Seq("v"))
    v.refresh()
    MatViews.register(MatViews.Spec(t, v, Seq("typ"), Seq("v")))
    cat.attachSqlCatalog("lake")

    // different group keys — no rewrite
    val byId = spark.sql("SELECT id, count(*) AS n FROM lake.gold.ev2 GROUP BY id")
    assert(planOf(byId).toLowerCase.contains("aggregate"))
    // sum is deliberately not rewritable (float-sum vs exact-state bits)
    val withSum = spark.sql(
      "SELECT typ, count(*) AS n, sum(v) AS s FROM lake.gold.ev2 GROUP BY typ")
    assert(planOf(withSum).toLowerCase.contains("aggregate"))
    // min over a column the view doesn't track — no rewrite
    val minId = spark.sql("SELECT typ, min(id) AS m FROM lake.gold.ev2 GROUP BY typ")
    assert(planOf(minId).toLowerCase.contains("aggregate"))
    // time travel must read ITS snapshot, never the current-state view
    val pinned = spark.sql(
      "SELECT typ, count(*) AS n FROM lake.gold.ev2 VERSION AS OF 0 GROUP BY typ")
    assert(planOf(pinned).toLowerCase.contains("aggregate"))
    assert(pinned.count() == 2)
  }

  test("sum(long) is served bit-exactly from the view; sum(double) still refuses") {
    MatViews.clear()
    val cat = Catalog(spark, scratchDir("mvcat3"))
    cat.createSchema("gold")
    val t = cat.table("gold", "ev3")
    val rows = (1 to 30).map(i => (i.toLong, s"t${i % 3}", i * 7L, i * 1.5))
    t.append(rows.take(15).toDF("id", "typ", "amount", "v"))
    t.append(rows.drop(15).toDF("id", "typ", "amount", "v"))
    val v = IncrementalAggView(
      t, scratchDir("mvview3"), Seq("typ"), Seq("amount", "v"))
    v.refresh()
    MatViews.register(
      MatViews.Spec(t, v, Seq("typ"), Seq.empty, sumCols = Seq("amount", "v")))
    cat.attachSqlCatalog("lake")

    // LONG sum: routed to the view (no aggregate in the plan), exact value
    val q = "SELECT typ, count(*) AS n, sum(amount) AS s FROM lake.gold.ev3 GROUP BY typ"
    val served = spark.sql(q)
    val p = planOf(served)
    assert(!p.toLowerCase.contains("aggregate"), s"long sum should route:\n$p")
    val expected = rows.groupBy(_._2).map { case (k, rs) =>
      (k, rs.size.toLong, rs.map(_._3).sum)
    }.toSet
    assert(served.as[(String, Long, Long)].collect().toSet == expected)

    // DOUBLE sum: declared on the view, but float-sum bits differ from
    // the exact state — must stay on the raw-scan path
    val dbl = spark.sql("SELECT typ, sum(v) AS s FROM lake.gold.ev3 GROUP BY typ")
    assert(planOf(dbl).toLowerCase.contains("aggregate"),
      s"double sum must NOT route:\n${planOf(dbl)}")
    // and an undeclared column never routes even with a fresh view
    val undeclared = spark.sql("SELECT typ, sum(id) AS s FROM lake.gold.ev3 GROUP BY typ")
    assert(planOf(undeclared).toLowerCase.contains("aggregate"))
  }

  test("group-key WHERE routes as a view-row filter; non-key WHERE refuses") {
    MatViews.clear()
    val cat = Catalog(spark, scratchDir("mvcat4"))
    cat.createSchema("gold")
    val t = cat.table("gold", "ev4")
    val rows = (1 to 40).map(i => (i.toLong, s"t${i % 4}", i * 3L))
    t.append(rows.take(20).toDF("id", "typ", "amount"))
    t.append(rows.drop(20).toDF("id", "typ", "amount"))
    val v = IncrementalAggView(
      t, scratchDir("mvview4"), Seq("typ"), Seq("amount"))
    v.refresh()
    MatViews.register(
      MatViews.Spec(t, v, Seq("typ"), Seq.empty, sumCols = Seq("amount")))
    cat.attachSqlCatalog("lake")

    // WHERE over the group key commutes with the group partition —
    // served by FILTERING VIEW ROWS, no aggregate left in the plan
    val keyed = spark.sql(
      "SELECT typ, count(*) AS n, sum(amount) AS s FROM lake.gold.ev4 " +
        "WHERE typ <> 't0' GROUP BY typ")
    val p1 = planOf(keyed)
    assert(!p1.toLowerCase.contains("aggregate"), s"key-filter should route:\n$p1")
    val expected = rows.filter(_._2 != "t0").groupBy(_._2).map { case (k, rs) =>
      (k, rs.size.toLong, rs.map(_._3).sum)
    }.toSet
    assert(keyed.as[(String, Long, Long)].collect().toSet == expected)

    // HAVING lands as a Filter above the rewritten aggregate — still routed
    val having = spark.sql(
      "SELECT typ, count(*) AS n FROM lake.gold.ev4 " +
        "WHERE typ >= 't1' GROUP BY typ HAVING count(*) >= 10")
    assert(!planOf(having).toLowerCase.contains("aggregate"))
    assert(having.as[(String, Long)].collect().toSet ==
      rows.filter(_._2 >= "t1").groupBy(_._2).map { case (k, rs) => (k, rs.size.toLong) }
        .filter(_._2 >= 10).toSet)

    // a NON-key filter selects within groups — the view cannot replay
    // it, so the raw-scan aggregate must survive
    val nonKey = spark.sql(
      "SELECT typ, count(*) AS n FROM lake.gold.ev4 WHERE id > 10 GROUP BY typ")
    val p2 = planOf(nonKey)
    assert(p2.toLowerCase.contains("aggregate"), s"non-key filter must refuse:\n$p2")
    assert(nonKey.as[(String, Long)].collect().toSet ==
      rows.filter(_._1 > 10).groupBy(_._2).map { case (k, rs) => (k, rs.size.toLong) }.toSet)

    // a non-deterministic key predicate must also refuse (rand() bounds
    // get folded by the optimizer, so probe with an unfoldable one)
    val nondet = spark.sql(
      "SELECT typ, count(*) AS n FROM lake.gold.ev4 " +
        "WHERE typ <> 't9' AND monotonically_increasing_id() >= 0 GROUP BY typ")
    assert(planOf(nondet).toLowerCase.contains("aggregate"))
  }
}
