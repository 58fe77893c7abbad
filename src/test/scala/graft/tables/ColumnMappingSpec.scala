package graft.tables

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Manifest-level column mapping ([[LakeTable.alterRenameColumn]] /
  * [[LakeTable.alterDropColumn]]): renames and drops are metadata-only
  * — immutable files keep their physical column names, old files stay
  * readable, re-added columns never resurface dropped data.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  test("RENAME COLUMN: old files readable under the new name; later writes interleave") {
    val t = LakeTable(spark, scratchDir("cm-rename"))
    t.append(Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("k", "name", "bal"))
    val filesBefore = t.files().select("commit_dir", "relative_path").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    t.alterRenameColumn("bal", "balance")
    // the old files were NOT rewritten...
    val filesAfter = t.files().select("commit_dir", "relative_path").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(filesAfter == filesBefore, "rename must be metadata-only")
    // ...yet reads serve its data under the new logical name
    assert(t.read().columns.toSeq == Seq("k", "name", "balance"))
    val got = t.read().collect().map(r => (r.getInt(0), r.getDouble(2))).toSet
    assert(got == Set((1, 10.0), (2, 20.0)), s"got $got")
    // a post-rename append reads back seamlessly (files store the
    // PHYSICAL name uniformly)
    t.append(Seq((3, "c", 30.0)).toDF("k", "name", "balance"))
    val all = t.read().collect().map(r => (r.getInt(0), r.getDouble(2))).toSet
    assert(all == Set((1, 10.0), (2, 20.0), (3, 30.0)), s"got $all")
    // the physical column name persists in BOTH eras' files
    val physNames = t.files().collect().map(_.getString(0)).distinct.flatMap { d =>
      spark.read.parquet(s"${t.root}/data/$d").columns
    }.toSet
    assert(physNames == Set("k", "name", "bal"), physNames.toString)
    // time travel BEFORE the rename still shows the old name
    assert(t.read(versionAsOf = Some(0L)).columns.toSeq == Seq("k", "name", "bal"))
  }

  test("rename chains and rename-back resolve to the original physical name") {
    val t = LakeTable(spark, scratchDir("cm-chain"))
    t.append(Seq((1, 5.0)).toDF("k", "v"))
    t.alterRenameColumn("v", "v2")
    t.alterRenameColumn("v2", "v3")
    assert(t.read().columns.toSeq == Seq("k", "v3"))
    assert(t.read().head().getDouble(1) == 5.0)
    t.alterRenameColumn("v3", "v") // back to the original: mapping collapses
    assert(t.read().columns.toSeq == Seq("k", "v"))
    assert(t.read().head().getDouble(1) == 5.0)
  }

  test("DROP COLUMN then ADD COLUMNS of the same name reads NULL — dropped data never resurfaces") {
    val t = LakeTable(spark, scratchDir("cm-drop"))
    t.append(Seq((1, "secret", 1.0), (2, "hidden", 2.0)).toDF("k", "note", "bal"))
    t.alterDropColumn("note")
    assert(t.read().columns.toSeq == Seq("k", "bal"))
    // time travel before the drop still reads it
    assert(t.read(versionAsOf = Some(0L)).select("note").collect().map(_.getString(0)).toSet ==
      Set("secret", "hidden"))
    t.alterAddColumns(Seq(org.apache.spark.sql.types.StructField(
      "note", org.apache.spark.sql.types.StringType)))
    val notes = t.read().select("note").collect().map(r => Option(r.getString(0)))
    assert(notes.forall(_.isEmpty), s"dropped data resurfaced: ${notes.toSeq}")
    // and a new write round-trips the re-added column
    t.append(Seq((3, 3.0, "fresh")).toDF("k", "bal", "note"))
    val got = t.read().collect().map(r => (r.getInt(0), Option(r.getString(2)))).toSet
    assert(got == Set((1, None), (2, None), (3, Some("fresh"))), s"got $got")
  }

  test("renamed watermark column keeps pruning: stats keys follow the logical name") {
    val t = LakeTable(spark, scratchDir("cm-stats"))
    t.append((1L to 100L).map(i => (i, i * 2.0)).toDF("seq", "v"), statsCols = Seq("seq"))
    t.append((101L to 200L).map(i => (i, i * 2.0)).toDF("seq", "v"))
    t.alterRenameColumn("seq", "offset")
    val (df, kept, skipped) = t.readBetweenWithPruneInfo("offset", Some(150L), Some(160L))
    assert(df.count() == 11)
    assert(kept.size == 1 && skipped.size == 1, s"kept=$kept skipped=$skipped")
    // and the incremental watermark survived the rename
    assert(t.read().count() == 200)
  }

  test("partition sources and constraint-referenced columns reject rename/drop loudly") {
    val t = LakeTable(spark, scratchDir("cm-guard"))
    t.append(Seq((1, "x", "2024")).toDF("k", "v", "yr"), partitionBy = Seq("yr"))
    val e1 = intercept[IllegalArgumentException](t.alterRenameColumn("yr", "year"))
    assert(e1.getMessage.contains("partition source"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](t.alterDropColumn("yr"))
    assert(e2.getMessage.contains("partition source"), e2.getMessage)
    t.addCheckConstraint("k_pos", "k > 0")
    val e3 = intercept[IllegalArgumentException](t.alterRenameColumn("k", "id"))
    assert(e3.getMessage.contains("k_pos"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](t.alterDropColumn("k"))
    assert(e4.getMessage.contains("k_pos"), e4.getMessage)
    // unknown column / duplicate target still fail
    intercept[IllegalArgumentException](t.alterRenameColumn("nope", "x"))
    intercept[IllegalArgumentException](t.alterRenameColumn("v", "yr"))
  }

  test("mapping survives merge, delete-DV, update and compaction") {
    val t = LakeTable(spark, scratchDir("cm-ops"))
    t.append(Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "name", "bal"))
    t.alterRenameColumn("bal", "balance")
    Merge.mergeScd1(t, Seq((2, "b2", 99.0), (9, "i", 1.0)).toDF("k", "name", "balance"), Seq("k"))
    assert(t.read().filter(col("k") === 2).head().getDouble(2) == 99.0)
    t.deleteWhereDV(col("k") === 3)
    assert(t.read().collect().map(_.getInt(0)).toSet == Set(1, 2, 9))
    t.updateWhere(col("k") === 1, Map("balance" -> org.apache.spark.sql.functions.lit(11.0)))
    assert(t.read().filter(col("k") === 1).head().getDouble(2) == 11.0)
    t.compact()
    val got = t.read().collect().map(r => (r.getInt(0), r.getDouble(2))).toSet
    assert(got == Set((1, 11.0), (2, 99.0), (9, 1.0)), s"got $got")
    assert(t.read().columns.toSeq == Seq("k", "name", "balance"))
  }

  test("renamed column survives CLUSTERED compaction (files keep physical names)") {
    val t = LakeTable(spark, scratchDir("cm-cluster"))
    t.append(Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "name", "bal"))
    t.alterRenameColumn("bal", "balance")
    t.compactClusteredBy(col("k"), Seq("k"), numFiles = 2)
    // the rewritten files must store the PHYSICAL name — a logical-named
    // compacted file would read back NULL for every renamed column
    val got = t.read().collect().map(r => (r.getInt(0), r.getDouble(2))).toSet
    assert(got == Set((1, 10.0), (2, 20.0), (3, 30.0)), s"got $got")
    val physNames = t.files().collect().map(_.getString(0)).distinct.flatMap { d =>
      spark.read.parquet(s"${t.root}/data/$d").columns
    }.toSet
    assert(physNames == Set("k", "name", "bal"), physNames.toString)
    // and the per-file zonemaps stayed keyed by the LOGICAL probe name
    val (_, _, _, (scanned, skipped)) =
      t.readBetweenWithFilePruneInfo("k", Some(1), Some(1))
    assert(scanned >= 1 && skipped >= 1, s"scanned=$scanned skipped=$skipped")
  }

  test("rename then re-add the old name: writes are order-free, no duplicate columns") {
    val t = LakeTable(spark, scratchDir("cm-readd"))
    t.append(Seq((1, 10.0)).toDF("k", "a"))
    t.alterRenameColumn("a", "c") // mapping: c -> a
    t.alterAddColumns(Seq(org.apache.spark.sql.types.StructField(
      "a", org.apache.spark.sql.types.DoubleType))) // mapping: c -> a, a -> a__gN
    // a sequential rename fold would create a duplicate `a` mid-fold
    // (c->a while the batch's own `a` is still present) and the write
    // would throw; the single projection must route each column to its
    // own physical target
    t.append(Seq((2, 20.0, 200.0)).toDF("k", "c", "a"))
    val rows = t.read().orderBy("k").collect()
    assert(t.read().columns.toSeq == Seq("k", "c", "a"))
    // old row: c carries the pre-rename value, re-added a reads NULL
    assert(rows(0).getDouble(1) == 10.0 && rows(0).isNullAt(2), rows(0).toString)
    assert(rows(1).getDouble(1) == 20.0 && rows(1).getDouble(2) == 200.0, rows(1).toString)
    // clustered compaction over the same mapping stays collision-free too
    t.compactClusteredBy(col("k"), Seq("k"), numFiles = 1)
    val after = t.read().orderBy("k").collect()
    assert(after(0).getDouble(1) == 10.0 && after(0).isNullAt(2), after(0).toString)
    assert(after(1).getDouble(1) == 20.0 && after(1).getDouble(2) == 200.0, after(1).toString)
  }

  test("evolve-append re-introducing a renamed column's original name never resurfaces old data") {
    val t = LakeTable(spark, scratchDir("cm-evolve"))
    t.append(Seq((1, "secret", 1.0)).toDF("k", "note", "bal"))
    t.alterDropColumn("note")
    // evolve-append re-introduces 'note' as a data column (no ALTER):
    // the dropped physical 'note' in the old file must stay buried
    t.append(Seq((2, 2.0, "fresh")).toDF("k", "bal", "note"))
    val rows = t.read().orderBy("k").collect()
    assert(t.read().columns.toSeq == Seq("k", "bal", "note"))
    assert(rows(0).isNullAt(2), s"dropped data resurfaced: ${rows(0)}")
    assert(rows(1).getString(2) == "fresh", rows(1).toString)
    // renamed variant: a batch introducing a NEW column named like the
    // renamed column's ORIGINAL physical name must not alias onto the
    // old file data (and the write must not produce duplicate columns)
    t.alterRenameColumn("bal", "balance") // mapping: balance -> bal
    t.append(Seq((3, 3.0, "n3", "clash")).toDF("k", "balance", "note", "bal"))
    val r2 = t.read().orderBy("k").collect()
    assert(t.read().columns.toSeq == Seq("k", "balance", "note", "bal"))
    assert(r2(0).getDouble(1) == 1.0 && r2(0).isNullAt(3),
      s"new 'bal' must read NULL on old rows, balance must keep its data: ${r2(0)}")
    assert(r2(2).getDouble(1) == 3.0 && r2(2).getString(3) == "clash", r2(2).toString)
  }

  test("WAP: readStaged and publish audit the PHYSICAL-named staged files correctly") {
    val t = LakeTable(spark, scratchDir("cm-wap"))
    t.append(Seq((1, 10.0)).toDF("k", "bal"))
    t.alterRenameColumn("bal", "balance")
    val s = t.stageAppend(Seq((2, 20.0)).toDF("k", "balance"))
    // the staged file stores physical 'bal' — the audit view must still
    // serve the value under the logical name, not all-NULL
    val audit = t.readStaged(s).collect()
    assert(audit.length == 1 && audit(0).getDouble(1) == 20.0, audit.toSeq.toString)
    // a constraint added between stage and publish re-validates against
    // the drift via readStaged — NULL-reading renamed columns would
    // wrongly reject (NULL fails CHECK)
    t.addCheckConstraint("bal_pos", "balance > 0")
    t.publishStaged(s)
    assert(t.read().orderBy("k").collect().map(_.getDouble(1)).toSeq == Seq(10.0, 20.0))
  }

  test("footer-stats group serve maps logical names to physical, refuses stale re-adds") {
    val t = LakeTable(spark, scratchDir("cm-pushdown"))
    t.append(Seq(("A", 5L), ("A", 7L), ("B", 3L)).toDF("g", "v"), partitionBy = Seq("g"))
    t.alterRenameColumn("v", "amount")
    val st = new graft.tables.v2.GraftSqlTable(t.root).metadataGroupStats(Seq("amount"))
    assert(st.isDefined, "rename must not break the serve — footers hold the physical chunk")
    val byG = st.get.map { case (g, n, r) => g -> ((n, r("amount"))) }.toMap
    assert(byG("A") == ((2L, Some((5L, 7L)))), byG.toString)
    assert(byG("B") == ((1L, Some((3L, 3L)))), byG.toString)
    // drop + evolve re-add: old files hold the ORIGINAL physical data —
    // the serve must refuse (fall back to the scan, which reads NULL),
    // never serve the stale chunk under the re-added logical name
    t.alterDropColumn("amount")
    t.append(Seq(("A", 9L)).toDF("g", "amount"))
    val st2 = new graft.tables.v2.GraftSqlTable(t.root).metadataGroupStats(Seq("amount"))
    assert(st2.isEmpty, "stale physical data must not be served for a re-added column")
  }

  test("partition-scoped replace assigns a fresh physical when its batch re-adds a dropped name") {
    val t = LakeTable(spark, scratchDir("cm-replace"))
    t.append(
      Seq((1, "p1", "secret"), (2, "p2", "hidden")).toDF("k", "part", "note"),
      partitionBy = Seq("part"))
    t.alterDropColumn("note")
    // the replace batch re-introduces 'note': the KEPT dir (part=p2)
    // still physically stores the dropped data — it must read NULL
    t.replacePartitions(
      Seq((1, "p1", "fresh")).toDF("k", "part", "note"), Seq("p1"))
    val byK = t.read().collect().map(r => r.getInt(0) ->
      (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(byK == Map(1 -> "fresh", 2 -> null), byK.toString)
  }

  test("fresh physical names skip over live columns that already carry the suffix") {
    val t = LakeTable(spark, scratchDir("cm-suffix"))
    // v0 append: live columns k, a, a__g2 — after dropping `a` at v1,
    // a re-add at prev.version=1 would generate candidate a__g2, which
    // COLLIDES with the live a__g2; the generator must skip to a__g3
    t.append(Seq((1, "orig", "keep")).toDF("k", "a", "a__g2"))
    t.alterDropColumn("a")
    t.alterAddColumns(Seq(org.apache.spark.sql.types.StructField(
      "a", org.apache.spark.sql.types.StringType)))
    // old row: re-added a reads NULL, a__g2 keeps its own data
    val r0 = t.read().head()
    val cols = t.read().columns.toSeq
    assert(cols == Seq("k", "a__g2", "a"), cols.toString)
    assert(r0.getString(1) == "keep" && r0.isNullAt(2), r0.toString)
    // and writes still work (no duplicate-physical projection)
    t.append(Seq((2, "two", "second")).toDF("k", "a__g2", "a"))
    val r2 = t.read().orderBy("k").collect()(1)
    assert(r2.getString(1) == "two" && r2.getString(2) == "second", r2.toString)
  }
}
