package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Hidden-partitioning transforms ([[PartitionSpec]]): the derived dir
  * column never reaches the declared schema, writes lay out
  * `ts__day=...` subdirs, and a range read PRUNES whole subdirs through
  * the transform — provable via `inputFiles` on the pruned scan.
  */
class PartitionTransformSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def dayRows(days: Seq[Int]): Seq[(Int, Timestamp, String)] =
    days.zipWithIndex.map { case (d, i) =>
      (i, ts(f"2024-03-$d%02d 12:00:00"), s"p$d")
    }

  test("days(ts): hive layout on the derived column; read() hides it; values round-trip") {
    val t = LakeTable(spark, scratchDir("pt-days"))
    t.append(dayRows(Seq(1, 2, 3)).toDF("id", "ts", "payload"), partitionBy = Seq("days(ts)"))
    // physical layout: ts__day=YYYY-MM-DD subdirs
    val rels = t.files().select("relative_path").collect().map(_.getString(0))
    assert(rels.nonEmpty && rels.forall(_.startsWith("ts__day=2024-03-")), rels.toSeq.toString)
    // declared schema only — the dir column is hidden
    assert(t.read().columns.toSeq == Seq("id", "ts", "payload"))
    val got = t.read().collect().map(r => (r.getInt(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(got == dayRows(Seq(1, 2, 3)).toSet)
  }

  test("days(ts): a ts-range read prunes whole day subdirs through the transform") {
    val t = LakeTable(spark, scratchDir("pt-prune"))
    t.append(dayRows(Seq(1, 2, 3, 4, 5)).toDF("id", "ts", "payload"), partitionBy = Seq("days(ts)"))
    // a second commit covering only later days — prunable WHOLE
    t.append(dayRows(Seq(20, 21)).toDF("id", "ts", "payload"))
    val (df, kept, skipped) = t.readBetweenWithPruneInfo(
      "ts", Some(ts("2024-03-02 00:00:00")), Some(ts("2024-03-03 23:59:59")))
    val got = df.collect().map(_.getInt(0)).toSet
    assert(got == Set(1, 2), s"got $got") // ids of day 2 and 3
    // dir-level skipping: only day-2/day-3 subdir files are read at all
    val files = df.inputFiles.toSeq
    assert(files.nonEmpty &&
      files.forall(f => f.contains("ts__day=2024-03-02") || f.contains("ts__day=2024-03-03")),
      files.toString)
    // the later commit has NO day subdir in range: skipped whole
    assert(kept.size == 1 && skipped.size == 1, s"kept=$kept skipped=$skipped")
  }

  test("days(ts): NULL timestamps land in the default dir; range reads exclude, full reads keep") {
    val t = LakeTable(spark, scratchDir("pt-null"))
    val rows = Seq(
      (1, Some(ts("2024-03-01 12:00:00")), "a"),
      (2, None, "b"))
    t.append(rows.toDF("id", "ts", "payload"), partitionBy = Seq("days(ts)"))
    assert(t.read().count() == 2) // the null row is data, not loss
    val inRange = t.readBetween(
      "ts", Some(ts("2024-03-01 00:00:00")), Some(ts("2024-03-02 00:00:00")))
    assert(inRange.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("bucket(n, k): writes spread across n dirs; reads round-trip; compact keeps the layout") {
    val t = LakeTable(spark, scratchDir("pt-bucket"))
    val rows = (0 until 64).map(i => (i.toLong, s"v$i"))
    t.append(rows.toDF("k", "v"), partitionBy = Seq("bucket(4,k)"))
    val dirs = t.files().select("relative_path").collect()
      .map(_.getString(0).split("/").head).distinct.sorted
    assert(dirs.forall(_.startsWith("k__bucket=")), dirs.toSeq.toString)
    assert(dirs.length == 4, s"64 keys over 4 buckets must hit all: ${dirs.toSeq}")
    assert(t.read().columns.toSeq == Seq("k", "v"))
    assert(t.read().count() == 64)
    // appends inherit the layout; compaction re-derives it
    t.append(rows.map { case (k, v) => (k + 100, v) }.toDF("k", "v"))
    t.compact()
    val dirs2 = t.files().select("relative_path").collect()
      .map(_.getString(0).split("/").head).distinct
    assert(dirs2.forall(_.startsWith("k__bucket=")), dirs2.toSeq.toString)
    assert(t.read().count() == 128)
  }

  test("months(ts) lexicographic cover; SCD1 merge on a transform-partitioned table") {
    val t = LakeTable(spark, scratchDir("pt-month"))
    val rows = Seq(
      (1, ts("2024-01-10 08:00:00"), 10.0),
      (2, ts("2024-02-10 08:00:00"), 20.0),
      (3, ts("2024-03-10 08:00:00"), 30.0))
    t.append(rows.toDF("id", "ts", "bal"), partitionBy = Seq("months(ts)"))
    val (df, _, _) = t.readBetweenWithPruneInfo(
      "ts", Some(ts("2024-02-01 00:00:00")), Some(ts("2024-02-28 23:59:59")))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(df.inputFiles.forall(_.contains("ts__month=2024-02")), df.inputFiles.toSeq.toString)
    // a merge rewrite re-derives the layout (overwrite path)
    Merge.mergeScd1(t, Seq((2, ts("2024-02-11 08:00:00"), 99.0)).toDF("id", "ts", "bal"), Seq("id"))
    assert(t.read().filter(col("id") === 2).head().getDouble(2) == 99.0)
    val rels = t.files().select("relative_path").collect().map(_.getString(0))
    assert(rels.forall(_.startsWith("ts__month=")), rels.toSeq.toString)
  }

  test("parse: unknown transforms and bad sources fail loudly; identity unchanged") {
    assert(PartitionSpec.parse("event_type") == IdentityPart("event_type"))
    assert(PartitionSpec.parse("days(ts)") == DaysPart("ts"))
    assert(PartitionSpec.parse("bucket(16,user_id)") == BucketPart(16, "user_id"))
    intercept[IllegalArgumentException](PartitionSpec.parse("hours(ts)"))
    intercept[IllegalArgumentException](PartitionSpec.parse("truncate(4,name)"))
    // a legacy identity column whose NAME carries parens keeps parsing
    // (pre-r20 manifests treated partitionBy entries as opaque names);
    // only KNOWN transform keywords reject
    assert(PartitionSpec.parse("sum(x)") == IdentityPart("sum(x)"))
    val t = LakeTable(spark, scratchDir("pt-bad"))
    val e = intercept[IllegalArgumentException] {
      t.createIfAbsent(
        Seq((1, "x")).toDF("k", "v").schema, partitionBy = Seq("days(nope)"))
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("time-transform layout is UTC-pinned: a non-UTC write session fails loudly") {
    // the layout is persistent state — a PST session deriving
    // ts__day=... dirs would disagree with every UTC reader's prune and
    // silently lose rows from range reads; the write must reject instead
    val t = LakeTable(spark, scratchDir("pt-utc"))
    t.append(dayRows(Seq(1)).toDF("id", "ts", "payload"), partitionBy = Seq("days(ts)"))
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val e = intercept[IllegalArgumentException] {
        t.append(dayRows(Seq(2)).toDF("id", "ts", "payload"))
      }
      assert(e.getMessage.contains("UTC"), e.getMessage)
      // bucket transforms are zone-free — unaffected by the session zone
      val b = LakeTable(spark, scratchDir("pt-utc-bucket"))
      b.append(Seq((1, "x")).toDF("k", "v"), partitionBy = Seq("bucket(4,k)"))
      assert(b.read().count() == 1)
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
    // back under UTC the append goes through
    t.append(dayRows(Seq(2)).toDF("id", "ts", "payload"))
    assert(t.read().count() == 2)
  }

  test("a mid-history layout change never lets the transform prune skip old-layout dirs") {
    val t = LakeTable(spark, scratchDir("pt-relayout"))
    // era 1: identity layout on a string column — subdirs are
    // region=..., whose values string-compare ABOVE any ISO date
    t.append(
      Seq((1, ts("2024-03-01 10:00:00"), "EUROPE")).toDF("id", "ts", "region"),
      partitionBy = Seq("region"))
    // era 2: the layout legally flips to days(ts)
    t.append(
      Seq((2, ts("2024-03-05 10:00:00"), "ASIA")).toDF("id", "ts", "region"),
      partitionBy = Seq("days(ts)"))
    // a ts-range covering only era 1's row: the era-1 dir has no
    // ts__day= subdirs, so it must scan conservatively — string-ranging
    // 'EUROPE' against '2024-03-02' would prune the dir whole and the
    // row would silently vanish
    val (df, kept, skipped) = t.readBetweenWithPruneInfo(
      "ts", Some(ts("2024-03-01 00:00:00")), Some(ts("2024-03-02 00:00:00")))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1), df.collect().toSeq.toString)
    // and the era-2 dir (out of range) still prunes through the transform
    assert(skipped.size == 1, s"kept=$kept skipped=$skipped")
  }

  test("transform layouts reject partition-scoped replace and dir-col name collisions") {
    val t = LakeTable(spark, scratchDir("pt-guards"))
    t.append(dayRows(Seq(1, 2)).toDF("id", "ts", "payload"), partitionBy = Seq("days(ts)"))
    // replacePartitions compares source-domain `affected` values against
    // DERIVED dir values — silently a no-op-with-duplicates if allowed
    val e1 = intercept[IllegalArgumentException] {
      t.replacePartitions(dayRows(Seq(1)).toDF("id", "ts", "payload"), Seq("2024-03-01"))
    }
    assert(e1.getMessage.contains("transform-partitioned"), e1.getMessage)
    // a user column named like the derived dir column would read dir
    // values instead of NULL and collide with every later derivation
    val e2 = intercept[IllegalArgumentException] {
      t.alterAddColumns(Seq(org.apache.spark.sql.types.StructField(
        "ts__day", org.apache.spark.sql.types.StringType)))
    }
    assert(e2.getMessage.contains("ts__day"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](t.alterRenameColumn("payload", "ts__day"))
    assert(e3.getMessage.contains("ts__day"), e3.getMessage)
  }
}
