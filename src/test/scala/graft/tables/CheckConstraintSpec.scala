package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Table-level CHECK constraints: validated against existing data at
  * add time, enforced on every later write path, survive unrelated
  * commits, droppable.
  */
class CheckConstraintSpec extends SparkSpec {
  import spark.implicits._

  test("add validates existing data; later appends/overwrites/updates enforce") {
    val t = LakeTable(spark, scratchDir("check"))
    t.append(Seq((1, 10.0), (2, 20.0)).toDF("id", "v"))
    t.addCheckConstraint("v_pos", "v > 0")
    assert(t.checkConstraints() == Map("v_pos" -> "v > 0"))

    // clean append passes and the constraint survives the commit
    t.append(Seq((3, 30.0)).toDF("id", "v"))
    assert(t.checkConstraints().contains("v_pos"))

    // violating append fails loudly and leaves NO trace
    val before = t.read().count()
    val e = intercept[IllegalStateException] {
      t.append(Seq((4, -1.0)).toDF("id", "v"))
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    assert(t.read().count() == before)
    assert(t.sweepOrphans(graceMs = 0L).isEmpty, "violating dir must be self-cleaned")

    // NULL predicate counts as a violation (SQL CHECK stance)
    intercept[IllegalStateException] {
      t.append(Seq((5, Option.empty[Double])).toDF("id", "v"))
    }

    // overwrite and merge-on-read update are enforced too
    intercept[IllegalStateException] { t.overwrite(Seq((9, -9.0)).toDF("id", "v")) }
    intercept[IllegalStateException] {
      t.updateWhere($"id" === 1, Map("v" -> lit(-5.0)))
    }
    assert(t.read().filter($"v" <= 0).count() == 0)
    // the violating update's already-written DV sidecar must not be
    // left orphaned on disk (it was never referenced by a manifest)
    val dvRoot = java.nio.file.Paths.get(t.root, "dv")
    val orphanDvs =
      if (!java.nio.file.Files.isDirectory(dvRoot)) 0L
      else {
        val s = java.nio.file.Files.list(dvRoot)
        try s.count() finally s.close()
      }
    assert(orphanDvs == 0, s"violating update must clean its DV sidecar, found $orphanDvs")

    // a constraint the current data violates is rejected at add time
    intercept[IllegalStateException] { t.addCheckConstraint("v_gt_15", "v > 15") }
    assert(!t.checkConstraints().contains("v_gt_15"))

    // drop releases enforcement
    t.dropCheckConstraint("v_pos")
    t.append(Seq((6, -6.0)).toDF("id", "v"))
    assert(t.read().filter($"v" < 0).count() == 1)
  }

  test("constraints survive clustered compaction and partition-scoped replace (r20 fix)") {
    // both ops publish the manifest with an explicit constructor and
    // silently DROPPED constraints before r20 — enforcement vanished
    // after routine maintenance
    val t = LakeTable(spark, scratchDir("check-compact"))
    t.append((1 to 20).map(i => (i, i * 1.0)).toDF("id", "v"))
    t.addCheckConstraint("v_pos", "v > 0")
    t.compactClusteredBy(col("id"), Seq("id"), numFiles = 2)
    assert(t.checkConstraints() == Map("v_pos" -> "v > 0"),
      "compactClustered must carry constraints forward")
    intercept[IllegalStateException] { t.append(Seq((99, -1.0)).toDF("id", "v")) }

    val p = LakeTable(spark, scratchDir("check-replace"))
    p.append(Seq((1, "a", 1.0), (2, "b", 2.0)).toDF("id", "part", "v"),
      partitionBy = Seq("part"))
    p.addCheckConstraint("v_pos", "v > 0")
    p.replacePartitions(Seq((1, "a", 9.0)).toDF("id", "part", "v"), Seq("a"))
    assert(p.checkConstraints() == Map("v_pos" -> "v > 0"),
      "replacePartitions must carry constraints forward")
    intercept[IllegalStateException] { p.append(Seq((3, "c", -1.0)).toDF("id", "part", "v")) }
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT DDL drives the same enforcement as CALL") {
    val cat = Catalog(spark, scratchDir("checkddl"))
    cat.createSchema("gold")
    val t = cat.table("gold", "ev")
    t.append(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    cat.attachSqlCatalog("lakec")
    spark.sql("ALTER TABLE lakec.gold.ev ADD CONSTRAINT v_pos CHECK (v > 0)")
    assert(t.checkConstraints() == Map("v_pos" -> "v > 0"))
    // enforcement identical to the API/CALL path
    intercept[IllegalStateException] { t.append(Seq((3L, -1.0)).toDF("id", "v")) }
    // adding over violating data is rejected at DDL time too
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lakec.gold.ev ADD CONSTRAINT v_big CHECK (v > 15)")
    }
    assert(e.getMessage.contains("violate"), e.getMessage)
    // characteristic clauses are refused loudly, not dropped
    intercept[Exception] {
      spark.sql("ALTER TABLE lakec.gold.ev ADD CONSTRAINT v2 CHECK (v > 0) ENFORCED")
    }
    // DROP without IF EXISTS on a missing name errors; IF EXISTS no-ops
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE lakec.gold.ev DROP CONSTRAINT nope")
    }
    assert(e2.getMessage.contains("does not exist"), e2.getMessage)
    spark.sql("ALTER TABLE lakec.gold.ev DROP CONSTRAINT IF EXISTS nope")
    spark.sql("ALTER TABLE lakec.gold.ev DROP CONSTRAINT v_pos")
    t.append(Seq((4L, -4.0)).toDF("id", "v")) // enforcement released
    assert(t.read().count() == 3)
    // an UNREGISTERED table name passes through to Spark untouched
    intercept[Exception] {
      spark.sql("ALTER TABLE not_a_lake_table ADD CONSTRAINT c CHECK (x > 0)")
    }
  }

  test("publishStaged re-validates constraints added after stage time") {
    val t = LakeTable(spark, scratchDir("checkwap"))
    t.append(Seq((1, 10.0), (2, 20.0)).toDF("id", "v"))
    // stage a batch that violates a constraint that does NOT exist yet —
    // stageAppend enforces only the set visible at stage time
    val staged = t.stageAppend(Seq((3, -3.0)).toDF("id", "v"))
    // adding the constraint succeeds: it validates PUBLISHED data only
    t.addCheckConstraint("v_pos", "v > 0")
    // the publish must re-check the drift and refuse the staged batch
    val e = intercept[IllegalStateException] { t.publishStaged(staged) }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    assert(t.read().count() == 2, "refused batch must stay invisible")
    t.abortStaged(staged)

    // a clean staged batch crosses the same drift without incident
    val ok = t.stageAppend(Seq((4, 40.0)).toDF("id", "v"))
    t.dropCheckConstraint("v_pos")
    t.addCheckConstraint("v_pos2", "v > 1")
    t.publishStaged(ok)
    assert(t.read().count() == 3)
  }

  test("batch omitting a constrained column fails as a violation, not AnalysisException") {
    val t = LakeTable(spark, scratchDir("checkomit"))
    t.append(Seq((1, 10.0)).toDF("id", "v"))
    t.addCheckConstraint("v_pos", "v > 0")
    // evolve mode admits a batch without `v` — but post-evolution those
    // rows read v as NULL, which the NULL-as-violation stance rejects
    val e = intercept[IllegalStateException] {
      t.append(Seq((2, "x")).toDF("id", "w"))
    }
    assert(e.getMessage.contains("v_pos") && e.getMessage.contains("omits"), e.getMessage)
    assert(t.read().count() == 1)
    assert(t.sweepOrphans(graceMs = 0L).isEmpty)
  }

  test("lambda-bound variables in a constraint are not read as missing columns") {
    val t = LakeTable(spark, scratchDir("checklambda"))
    t.append(Seq((1, Seq(1, 2))).toDF("id", "tags"))
    // `x` is lambda-bound — only `tags` is a real column reference; the
    // r15 free-ref collector reported `x` missing and rejected every batch
    t.addCheckConstraint("tags_pos", "exists(tags, x -> x > 0)")
    t.append(Seq((2, Seq(3))).toDF("id", "tags"))
    assert(t.read().count() == 2)
    // enforcement itself still works through the lambda
    intercept[IllegalStateException] {
      t.append(Seq((3, Seq(-1, -2))).toDF("id", "tags"))
    }
    // and a batch genuinely omitting `tags` is still caught up front
    val e = intercept[IllegalStateException] {
      t.append(Seq((4, "w")).toDF("id", "other"))
    }
    assert(e.getMessage.contains("tags"), e.getMessage)
  }

  test("unnamed ADD CHECK is refused loudly (no null-named manifest constraint)") {
    val cat = Catalog(spark, scratchDir("checknoname"))
    cat.createSchema("gold")
    val t = cat.table("gold", "evn")
    t.append(Seq((1L, 10.0)).toDF("id", "v"))
    cat.attachSqlCatalog("laken")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE laken.gold.evn ADD CHECK (v > 0)")
    }
    assert(e.getMessage.contains("explicit constraint name"), e.getMessage)
    assert(t.checkConstraints().isEmpty)
  }
}
