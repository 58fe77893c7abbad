package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.{Catalog, LakeTable, Merge}

class MergeSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTarget(tag: String, rows: Seq[(Int, String, Double)]): LakeTable = {
    val t = LakeTable(spark, scratchDir(tag))
    t.append(rows.toDF("k", "name", "bal"))
    t
  }

  test("MERGE INTO: UPDATE SET * / INSERT * matches the programmatic SCD1 merge") {
    val base = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
    val updates = Seq((2, "b2", 99.0), (9, "i", 1.0))
    val viaSql = freshTarget("msql1", base)
    MergeSqlTargets.register(spark, "t_msql1", viaSql.root)
    updates.toDF("k", "name", "bal").createOrReplaceTempView("s_msql1")
    spark.sql(
      """MERGE INTO t_msql1 t USING s_msql1 s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val viaApi = freshTarget("mapi1", base)
    Merge.mergeScd1(viaApi, updates.toDF("k", "name", "bal"), Seq("k"))
    val got = viaSql.read().collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    val want = viaApi.read().collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == want, s"sql=$got api=$want")
    assert(got == Set((1, "a", 10.0), (2, "b2", 99.0), (3, "c", 30.0), (9, "i", 1.0)))
  }

  test("MERGE clause values are cast to the declared column types (store assignment)") {
    val t = LakeTable(spark, scratchDir("mcast"))
    t.append(Seq((1, 10), (2, 20)).toDF("k", "cnt"))
    MergeSqlTargets.register(spark, "t_mcast", t.root)
    Seq((2, 5), (3, 7)).toDF("k", "cnt").createOrReplaceTempView("s_mcast")
    // BIGINT-typed update and insert values on an INT column: store
    // assignment casts to the DECLARED type — before this rule the CASE
    // output widened to BIGINT and the commit died in SchemaDrift
    spark.sql(
      """MERGE INTO t_mcast t USING s_mcast s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET cnt = t.cnt + CAST(s.cnt AS BIGINT)
        |WHEN NOT MATCHED THEN INSERT (k, cnt) VALUES (s.k, s.cnt * 2L)""".stripMargin)
    assert(t.read().schema("cnt").dataType == org.apache.spark.sql.types.IntegerType,
      t.read().schema.treeString)
    val got = t.read().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((1, 10), (2, 25), (3, 14)), s"got $got")
    // star actions cast too: a LONG-columned source merged via SET * /
    // INSERT * must store as the target's INT
    Seq((3L, 100L), (4L, 40L)).toDF("k", "cnt").createOrReplaceTempView("s_mcast_star")
    spark.sql(
      """MERGE INTO t_mcast t USING s_mcast_star s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(t.read().schema("cnt").dataType == org.apache.spark.sql.types.IntegerType)
    val got2 = t.read().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got2 == Set((1, 10), (2, 25), (3, 100), (4, 40)), s"got $got2")
  }

  test("MERGE INTO: conditional UPDATE assignments, DELETE clause, conditional INSERT") {
    val t = freshTarget("msql2", Seq((1, "keep", 5.0), (2, "upd", 10.0), (3, "del", 15.0)))
    MergeSqlTargets.register(spark, "t_msql2", t.root)
    Seq((2, "u", 100.0), (3, "d", 0.0), (4, "newbig", 50.0), (5, "newsmall", 0.5))
      .toDF("k", "name", "bal").createOrReplaceTempView("s_msql2")
    spark.sql(
      """MERGE INTO t_msql2 t USING s_msql2 s ON t.k = s.k
        |WHEN MATCHED AND s.bal = 0.0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET bal = s.bal + t.bal
        |WHEN NOT MATCHED AND s.bal > 1.0 THEN INSERT (k, name) VALUES (s.k, s.name)
        |""".stripMargin)
    val got = t.read().collect()
      .map(r => (r.getInt(0), r.getString(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .toSet
    // 1 untouched; 2 updated (bal summed, name kept); 3 deleted;
    // 4 inserted with bal NULL (unassigned); 5 filtered by insert cond
    assert(got == Set((1, "keep", 5.0), (2, "upd", 110.0), (4, "newbig", null)), s"got $got")
  }

  test("MERGE INTO: WHEN NOT MATCHED BY SOURCE delete/update — the full-sync pattern") {
    val t = freshTarget("mbys1",
      Seq((1, "stay", 5.0), (2, "upd", 10.0), (3, "gone-neg", -1.0), (4, "gone-pos", 7.0)))
    MergeSqlTargets.register(spark, "t_mbys1", t.root)
    Seq((1, "stay2", 50.0), (2, "upd2", 20.0), (9, "new", 9.0))
      .toDF("k", "name", "bal").createOrReplaceTempView("s_mbys1")
    // 3 and 4 are absent from the source: 3 (bal<0) deleted, 4
    // deactivated by the second by-source clause (first-match-wins)
    spark.sql(
      """MERGE INTO t_mbys1 t USING s_mbys1 s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.bal < 0 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = 'inactive'
        |""".stripMargin)
    val got = t.read().collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1, "stay2", 50.0), (2, "upd2", 20.0), (4, "inactive", 7.0), (9, "new", 9.0)), s"got $got")
  }

  test("MERGE INTO: by-source-only merge tolerates duplicate source matches (semi/anti)") {
    val t = freshTarget("mbys2", Seq((1, "a", 1.0), (2, "b", 2.0)))
    MergeSqlTargets.register(spark, "t_mbys2", t.root)
    // key 1 appears TWICE in the source: with no matched action there is
    // no per-match rewrite, so no cardinality rule applies (Delta
    // semantics) — matched rows pass through once, absent rows delete
    Seq((1, "x", 0.0), (1, "y", 0.0)).toDF("k", "name", "bal")
      .createOrReplaceTempView("s_mbys2")
    spark.sql(
      """MERGE INTO t_mbys2 t USING s_mbys2 s ON t.k = s.k
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = t.read().collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1, "a", 1.0)), s"got $got")
  }

  test("MERGE INTO: by-source clauses referencing the source fail loudly; SET * rejected") {
    val t = freshTarget("mbys3", Seq((1, "a", 1.0)))
    MergeSqlTargets.register(spark, "t_mbys3", t.root)
    Seq((1, "x", 2.0)).toDF("k", "name", "bal").createOrReplaceTempView("s_mbys3")
    // a source reference in a by-source condition cannot resolve (the
    // anti-join branch has no source columns in scope)
    val srcRef = intercept[Exception] {
      spark.sql(
        """MERGE INTO t_mbys3 t USING s_mbys3 s ON t.k = s.k
          |WHEN NOT MATCHED BY SOURCE AND s.bal > 0 THEN DELETE""".stripMargin)
    }
    assert(
      srcRef.getMessage.toLowerCase.contains("resolve") ||
        srcRef.getMessage.toLowerCase.contains("cannot"),
      srcRef.getMessage)
    // `UPDATE SET *` in a by-source clause dies in Spark's own grammar
    // (there is no source row to copy); the parse-level require in
    // GraftMergeParser is defense-in-depth behind it
    val star = intercept[Exception] {
      spark.sql(
        """MERGE INTO t_mbys3 t USING s_mbys3 s ON t.k = s.k
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *""".stripMargin)
    }
    assert(star.getMessage.contains("PARSE_SYNTAX_ERROR"), star.getMessage)
    // both failed statements left the table untouched
    val got = t.read().collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1, "a", 1.0)), s"got $got")
  }

  test("MERGE INTO: by-source values cast to declared types; cardinality still enforced with matched actions") {
    val t = LakeTable(spark, scratchDir("mbys4"))
    t.append(Seq((1, 10), (2, 20)).toDF("k", "cnt"))
    MergeSqlTargets.register(spark, "t_mbys4", t.root)
    Seq((1, 5)).toDF("k", "cnt").createOrReplaceTempView("s_mbys4")
    // BIGINT-typed by-source assignment on an INT column → store-assigned
    spark.sql(
      """MERGE INTO t_mbys4 t USING s_mbys4 s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET cnt = s.cnt
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET cnt = t.cnt + CAST(1 AS BIGINT)
        |""".stripMargin)
    assert(t.read().schema("cnt").dataType == org.apache.spark.sql.types.IntegerType)
    val got = t.read().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((1, 5), (2, 21)), s"got $got")
    // with a matched action present the inner-join rewrite needs the
    // cardinality probe — duplicates must still fail loudly
    Seq((1, 7), (1, 8)).toDF("k", "cnt").createOrReplaceTempView("s_mbys4_dup")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO t_mbys4 t USING s_mbys4_dup s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("multiple source rows"), e.getMessage)
    assert(t.read().collect().map(r => (r.getInt(0), r.getInt(1))).toSet == Set((1, 5), (2, 21)))
  }

  test("MERGE INTO: inline subquery source (USING (SELECT ...)) works") {
    val t = freshTarget("msub", Seq((1, "a", 10.0), (2, "b", 20.0)))
    MergeSqlTargets.register(spark, "t_msub", t.root)
    Seq((1, "a9", 90.0), (2, "bx", 5.0), (9, "i", 1.0), (10, "j", 0.5))
      .toDF("k", "name", "bal").createOrReplaceTempView("s_msub_raw")
    // the source is an arbitrary query, aliased — filters + projections
    // resolve inside it, and SET */INSERT * see its output columns
    spark.sql(
      """MERGE INTO t_msub t
        |USING (SELECT k, name, bal * 2 AS bal FROM s_msub_raw WHERE bal >= 1.0) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = t.read().collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1, "a9", 180.0), (2, "bx", 10.0), (9, "i", 2.0)), s"got $got")
  }

  test("MERGE matched rewrite consumes the probe's persisted join, not a second target×source join") {
    val t = freshTarget("mshare", Seq((1, "a", 1.0), (2, "b", 2.0)))
    MergeSqlTargets.register(spark, "t_mshare", t.root)
    Seq((1, "a2", 9.0), (3, "c", 3.0)).toDF("k", "name", "bal")
      .createOrReplaceTempView("s_mshare")
    val plans = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    // force the past-broadcast-threshold path: small sources keep the
    // cheap eager probe (re-joining a broadcast side twice beats cache
    // machinery), large sources must share ONE persisted matched join
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql(
        """MERGE INTO t_mshare t USING s_mshare s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // listener delivery is async — poll for the overwrite's plan: the
      // UNION of (matched rewrite, insert anti). Its matched branch must
      // read the cardinality probe's cached join (InMemoryTableScan),
      // never re-run the target×source LEFT OUTER join a second time.
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      def rewrite(): Option[String] = {
        import scala.jdk.CollectionConverters._
        plans.asScala.toSeq.find(p => p.contains("LeftAnti") && p.contains("Union"))
      }
      var found = rewrite()
      while (found.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100); found = rewrite()
      }
      assert(found.nonEmpty, "no overwrite execution captured")
      assert(
        found.get.contains("InMemoryTableScan"),
        s"matched rewrite must reuse the probe's persisted join:\n${found.get.take(4000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
      spark.listenerManager.unregister(listener)
    }
    val got = t.read().collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1, "a2", 9.0), (2, "b", 2.0), (3, "c", 3.0)), s"got $got")
  }

  test("MERGE INTO enforces the source-cardinality rule") {
    val t = freshTarget("msql3", Seq((1, "a", 1.0)))
    MergeSqlTargets.register(spark, "t_msql3", t.root)
    Seq((1, "x", 2.0), (1, "y", 3.0)).toDF("k", "name", "bal")
      .createOrReplaceTempView("s_msql3")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO t_msql3 t USING s_msql3 s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e.getMessage.contains("multiple source rows"), e.getMessage)
    // and the table is untouched after the failed merge
    assert(t.read().collect().map(_.getString(1)).toSeq == Seq("a"))
  }

  test("MERGE INTO an unregistered name falls through to Spark's own path") {
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("not_a_lake_table")
    Seq((1, "b")).toDF("k", "v").createOrReplaceTempView("some_src")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO not_a_lake_table t USING some_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    // Spark rejects MERGE into a non-row-level-op relation; the exact
    // error class is Spark's business — ours is only that we did NOT
    // intercept (no graft wording in the message)
    assert(!e.getMessage.contains("graft"), e.getMessage)
  }

  test("INSERT INTO: first load creates the table; positional insert casts to the target schema") {
    val root = scratchDir("isql1") + "/t"
    MergeSqlTargets.register(spark, "t_isql1", root)
    Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("k", "name", "bal")
      .createOrReplaceTempView("s_isql1")
    spark.sql("INSERT INTO t_isql1 SELECT * FROM s_isql1")
    val t = LakeTable(spark, root)
    assert(t.read().count() == 2)
    // positional semantics with differently-NAMED but castable columns
    Seq((3, "c", 9)).toDF("x", "y", "z").createOrReplaceTempView("s_isql1b")
    spark.sql("INSERT INTO t_isql1 SELECT * FROM s_isql1b")
    val got = t.read().orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 9.0)), s"got $got")
  }

  test("INSERT INTO with a column list fills unlisted columns with typed NULLs; OVERWRITE replaces") {
    val root = scratchDir("isql2") + "/t"
    val t = LakeTable(spark, root)
    t.append(Seq((1, "a", 1.0)).toDF("k", "name", "bal"))
    MergeSqlTargets.register(spark, "t_isql2", root)
    Seq((5, "e")).toDF("k", "name").createOrReplaceTempView("s_isql2")
    spark.sql("INSERT INTO t_isql2 (k, name) SELECT k, name FROM s_isql2")
    val got = t.read().orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .toSeq
    assert(got == Seq((1, "a", 1.0), (5, "e", null)), s"got $got")
    spark.sql("INSERT OVERWRITE t_isql2 (k, name) SELECT k + 10, name FROM s_isql2")
    assert(t.read().collect().map(_.getInt(0)).toSeq == Seq(15))
  }

  test("DELETE FROM: alias-qualified WHERE deletes via a deletion vector; history time-travels") {
    val t = freshTarget("dsql1", Seq((1, "a", 1.0), (2, "b", -2.0), (3, "c", 3.0), (4, "d", -4.0)))
    MergeSqlTargets.register(spark, "t_dsql1", t.root)
    spark.sql("DELETE FROM t_dsql1 AS x WHERE x.bal < 0 AND x.k > 2")
    assert(t.read().collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
    // merge-on-read: the commit is a DV sidecar, not a rewrite
    val ops = t.snapshots().orderBy("version").collect().map(_.getString(2)).toSeq
    assert(ops == Seq("append", "delete-dv"), s"ops $ops")
    // and the pre-delete snapshot is still readable
    assert(t.read(versionAsOf = Some(0)).count() == 4)
  }

  test("DELETE FROM: NULL-condition rows are kept; no-match delete is a no-op version") {
    val t = LakeTable(spark, scratchDir("dsql2"))
    t.append(Seq((1, Some(1.0)), (2, None), (3, Some(-3.0))).toDF("k", "bal"))
    MergeSqlTargets.register(spark, "t_dsql2", t.root)
    spark.sql("DELETE FROM t_dsql2 WHERE bal < 0")
    // row 2's predicate is NULL → kept (SQL DELETE removes only true)
    assert(t.read().collect().map(_.getInt(0)).toSet == Set(1, 2))
    val v = t.latestVersion().get
    spark.sql("DELETE FROM t_dsql2 WHERE bal > 100")
    assert(t.latestVersion().get == v, "no-match delete must not commit")
  }

  test("DELETE FROM without WHERE truncates with one empty commit, not a DV per row") {
    val t = freshTarget("dsql3", Seq((1, "a", 1.0), (2, "b", 2.0)))
    MergeSqlTargets.register(spark, "t_dsql3", t.root)
    spark.sql("DELETE FROM t_dsql3")
    assert(t.read().count() == 0)
    assert(t.read().schema.fieldNames.toSeq == Seq("k", "name", "bal"))
    val ops = t.snapshots().orderBy("version").collect().map(_.getString(2)).toSeq
    assert(ops == Seq("append", "overwrite"), s"ops $ops")
    assert(t.read(versionAsOf = Some(0)).count() == 2)
  }

  test("UPDATE: conditional SET with qualified refs; NULL-condition rows keep old values") {
    val t = LakeTable(spark, scratchDir("usql1"))
    t.append(Seq((1, Some(10.0)), (2, None), (3, Some(30.0))).toDF("k", "bal"))
    MergeSqlTargets.register(spark, "t_usql1", t.root)
    spark.sql("UPDATE t_usql1 AS x SET x.bal = x.bal * 2 WHERE x.bal >= 20")
    val got = t.read().collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getDouble(1))).toSet
    assert(got == Set((1, 10.0), (2, null), (3, 60.0)), s"got $got")
  }

  test("UPDATE with WHERE is merge-on-read: one commit, no data file rewritten") {
    val t = LakeTable(spark, scratchDir("umor"))
    t.append(Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "bal"))
    t.append(Seq((4, 40.0), (5, 50.0)).toDF("k", "bal"))
    MergeSqlTargets.register(spark, "t_umor", t.root)
    val filesBefore = t.files().select("commit_dir", "relative_path").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val vBefore = t.snapshots().agg(org.apache.spark.sql.functions.max("version")).head().getLong(0)
    spark.sql("UPDATE t_umor SET bal = bal + 1000 WHERE k IN (2, 5)")
    // exactly ONE new snapshot, operation 'update' (atomic DV + rewrite)
    val snaps = t.snapshots().orderBy("version").collect()
    assert(snaps.last.getAs[Long]("version") == vBefore + 1)
    assert(snaps.last.getAs[String]("operation") == "update")
    // every pre-update file is still live and untouched; only the two
    // matched rows' new copies were written
    val filesAfter = t.files().select("commit_dir", "relative_path").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(filesBefore.subsetOf(filesAfter), "merge-on-read must not rewrite existing files")
    assert((filesAfter -- filesBefore).nonEmpty)
    val got = t.read().collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(got == Set((1, 10.0), (2, 1020.0), (3, 30.0), (4, 40.0), (5, 1050.0)), s"got $got")
    // time travel still reads the pre-update values
    val old = t.read(versionAsOf = Some(vBefore)).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(old.contains((2, 20.0)) && old.size == 5)
    // a later compaction materializes the update (DVs cleared)
    t.compact()
    assert(t.read().collect().map(r => (r.getInt(0), r.getDouble(1))).toSet == got)
    // no-match UPDATE is a no-op commit-wise
    val vNow = t.snapshots().agg(org.apache.spark.sql.functions.max("version")).head().getLong(0)
    spark.sql("UPDATE t_umor SET bal = 0 WHERE k = 999")
    assert(t.snapshots().agg(org.apache.spark.sql.functions.max("version")).head().getLong(0) == vNow)
  }

  test("UPDATE without WHERE updates every row; values cast to the declared column type") {
    val t = freshTarget("usql2", Seq((1, "a", 1.0), (2, "b", 2.0)))
    MergeSqlTargets.register(spark, "t_usql2", t.root)
    // k is Int; the literal is a BIGINT sum — must cast, not evolve
    spark.sql("UPDATE t_usql2 SET k = k + 100, name = upper(name)")
    val got = t.read().orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((101, "A", 1.0), (102, "B", 2.0)), s"got $got")
    assert(t.read().schema("k").dataType == org.apache.spark.sql.types.IntegerType)
  }

  test("UPDATE rejects unknown and duplicate SET columns; DELETE/UPDATE reject subqueries") {
    val t = freshTarget("usql3", Seq((1, "a", 1.0)))
    MergeSqlTargets.register(spark, "t_usql3", t.root)
    val unknown = intercept[Exception](spark.sql("UPDATE t_usql3 SET nope = 1"))
    assert(unknown.getMessage.contains("not in the target schema"), unknown.getMessage)
    val dup = intercept[Exception](spark.sql("UPDATE t_usql3 SET bal = 1, bal = 2"))
    assert(dup.getMessage.contains("twice"), dup.getMessage)
    Seq(1).toDF("k").createOrReplaceTempView("sub_src")
    val dsub = intercept[Exception](
      spark.sql("DELETE FROM t_usql3 WHERE k IN (SELECT k FROM sub_src)"))
    assert(dsub.getMessage.contains("does not support subqueries"), dsub.getMessage)
    val usub = intercept[Exception](
      spark.sql("UPDATE t_usql3 SET bal = (SELECT max(k) FROM sub_src)"))
    assert(usub.getMessage.contains("does not support subqueries"), usub.getMessage)
    // the failed statements left the table untouched
    assert(t.read().count() == 1)
  }

  test("MergeSqlTargets registrations are session-scoped and weakly held") {
    val s2 = spark.newSession()
    MergeSqlTargets.register(s2, "t_scoped", "/tmp/graft-scope-probe")
    // scoped: another session (ours) must not resolve s2's names
    assert(MergeSqlTargets.rootFor(s2, Seq("t_scoped")).isDefined)
    assert(MergeSqlTargets.rootFor(spark, Seq("t_scoped")).isEmpty)
    // weak: dropping the only strong reference makes the entry collectible
    val before = MergeSqlTargets.liveSessionCount
    locally {
      var s3 = spark.newSession()
      MergeSqlTargets.register(s3, "t_weak", "/tmp/graft-weak-probe")
      assert(MergeSqlTargets.liveSessionCount >= before + 1)
      s3 = null
    }
    var tries = 0
    while (MergeSqlTargets.liveSessionCount > before && tries < 100) {
      System.gc(); Thread.sleep(20); tries += 1
    }
    // the JVM never guarantees System.gc() collects: a still-live probe
    // is inconclusive, not a product failure — cancel instead of fail
    if (MergeSqlTargets.liveSessionCount > before)
      cancel(s"GC did not collect the probe session after $tries rounds")
  }

  test("DELETE/UPDATE on unregistered names fall through to Spark's own path") {
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("not_ours_du")
    val d = intercept[Exception](spark.sql("DELETE FROM not_ours_du WHERE k = 1"))
    assert(!d.getMessage.contains("graft"), d.getMessage)
    val u = intercept[Exception](spark.sql("UPDATE not_ours_du SET v = 'x'"))
    assert(!u.getMessage.contains("graft"), u.getMessage)
  }

  test("Catalog.registerView names are MERGE-able and merge reads the current version") {
    val root = scratchDir("msqlcat")
    val cat = Catalog(spark, root)
    cat.createSchema("silver")
    cat.table("silver", "dim").append(Seq((1, "a", 1.0)).toDF("k", "name", "bal"))
    val view = cat.registerView("silver", "dim")
    assert(view == "silver_dim")
    // advance the table PAST the registered view's snapshot: MERGE must
    // see the appended row (current version), not the view's pin
    cat.table("silver", "dim").append(Seq((2, "b", 2.0)).toDF("k", "name", "bal"))
    Seq((2, "b9", 9.0), (7, "n", 7.0)).toDF("k", "name", "bal")
      .createOrReplaceTempView("s_cat")
    spark.sql(
      """MERGE INTO silver_dim t USING s_cat s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = cat.table("silver", "dim").read().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1, "a", 1.0), (2, "b9", 9.0), (7, "n", 7.0)), s"got $got")
  }
}
