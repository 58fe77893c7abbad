package graft.tables

import graft.SparkSpec

class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def destroyDataFiles(root: String): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "data"))
    try walk.iterator().asScala.toSeq.reverse
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
  }

  test("refresh reads ONLY the commits added since the last refresh (old files destroyed)") {
    val srcRoot = scratchDir("ivsrc")
    val src = LakeTable(spark, srcRoot)
    val wave1 = Seq(("a", 1.5), ("b", 2.25), ("a", 0.25)).toDF("k", "v")
    val wave2 = Seq(("a", 1.0), ("c", 4.5)).toDF("k", "v")
    src.append(wave1)
    val view = IncrementalAggView(src, scratchDir("ivview"), Seq("k"), Seq("v"))
    view.refresh()
    // wave 1's data files are gone: a second refresh that touched them
    // would throw — surviving proves the delta read is commit-scoped
    destroyDataFiles(srcRoot)
    src.append(wave2)
    view.refresh()
    val got = view.read().select($"k", $"n_rows", $"sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("a", 3L, 2.75), ("b", 1L, 2.25), ("c", 1L, 4.5)))
  }

  test("refresh-in-steps equals one full recompute exactly (additive integer-scaled state)") {
    val src = LakeTable(spark, scratchDir("ivsrc2"))
    val all = (1 to 300).map(i => (s"g${i % 7}", i * 0.0001 + (i % 13) * 1.5))
    val view = IncrementalAggView(src, scratchDir("ivview2"), Seq("k"), Seq("v"), Seq("v"))
    all.grouped(100).foreach { chunk =>
      src.append(chunk.toDF("k", "v"))
      view.refresh()
    }
    val srcFull = LakeTable(spark, scratchDir("ivsrc2f"))
    srcFull.append(all.toDF("k", "v"))
    val viewFull = IncrementalAggView(srcFull, scratchDir("ivview2f"), Seq("k"), Seq("v"), Seq("v"))
    viewFull.refresh()
    val a = view.read().orderBy("k").collect().toSeq
    val b = viewFull.read().orderBy("k").collect().toSeq
    assert(a == b, s"stepwise refresh diverged from full recompute:\n$a\nvs\n$b")
  }

  test("int sums beyond int-range ×10⁴ stay exact (state scales in decimal, not native type)") {
    // 500_000 * 10_000 = 5e9 overflows Int; the r15 state computed
    // `round(c * 10000)` in the column's NATIVE type and wrapped (or
    // threw under ANSI) — the decimal-scaled state must not
    val src = LakeTable(spark, scratchDir("ivovf"))
    src.append(Seq(("a", 500000), ("a", 500001), ("b", -300000)).toDF("k", "v"))
    val view = IncrementalAggView(src, scratchDir("ivovfview"), Seq("k"), Seq("v"))
    view.refresh()
    val got = view.read().select($"k", $"n_rows", $"sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("a", 2L, 1000001.0), ("b", 1L, -300000.0)))
    // and LongType beyond long/1e4 headroom at the sum level still adds
    // exactly in the decimal(38,0) state across two refreshes
    val src2 = LakeTable(spark, scratchDir("ivovf2"))
    src2.append(Seq(("a", 4L * 1000 * 1000 * 1000)).toDF("k", "v"))
    val view2 = IncrementalAggView(src2, scratchDir("ivovf2view"), Seq("k"), Seq("v"))
    view2.refresh()
    src2.append(Seq(("a", 4L * 1000 * 1000 * 1000)).toDF("k", "v"))
    view2.refresh()
    val got2 = view2.read().select($"n_rows", $"sum_v").head()
    assert((got2.getLong(0), got2.getDouble(1)) == ((2L, 8.0e9)))
  }

  test("decimal sum column with >30 integer digits is refused loudly at refresh") {
    val src = LakeTable(spark, scratchDir("ivdec"))
    val df = spark.sql("SELECT 'a' AS k, CAST(1 AS DECIMAL(38,0)) AS v")
    src.append(df)
    val view = IncrementalAggView(src, scratchDir("ivdecview"), Seq("k"), Seq("v"))
    val e = intercept[IllegalArgumentException](view.refresh())
    assert(e.getMessage.contains("decimal(38,0)"))
    // the exact failure band the r16 bound admitted: p-s in (30, 34] can
    // overflow the decimal(38,4)-typed ×10⁴ product (|x| ≥ 1e30 throws
    // under ANSI, silently NULLs without) — refused up front now
    val src34 = LakeTable(spark, scratchDir("ivdec34"))
    src34.append(spark.sql("SELECT 'a' AS k, CAST(1e31 AS DECIMAL(34,0)) AS v"))
    val view34 = IncrementalAggView(src34, scratchDir("ivdec34view"), Seq("k"), Seq("v"))
    val e34 = intercept[IllegalArgumentException](view34.refresh())
    assert(e34.getMessage.contains("decimal(34,0)"))
    // …while p-s = 30 (the widest the product representation holds for)
    // still refreshes exactly
    val src30 = LakeTable(spark, scratchDir("ivdec30"))
    src30.append(spark.sql("SELECT 'a' AS k, CAST(1.25 AS DECIMAL(32,2)) AS v"))
    val view30 = IncrementalAggView(src30, scratchDir("ivdec30view"), Seq("k"), Seq("v"))
    view30.refresh()
    assert(view30.read().select($"sum_v").head().getDouble(0) == 1.25)
  }

  test("non-additive source change (overwrite) degrades to a correct full recompute") {
    val src = LakeTable(spark, scratchDir("ivsrc3"))
    src.append(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    val view = IncrementalAggView(src, scratchDir("ivview3"), Seq("k"), Seq("v"))
    view.refresh()
    src.overwrite(Seq(("a", 5.0)).toDF("k", "v")) // history no longer additive
    view.refresh()
    val got = view.read().select($"k", $"n_rows", $"sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 1L, 5.0)), s"stale or merged state survived an overwrite: $got")
  }

  test("refresh with no new commits is a no-op; expired baseline manifest recomputes") {
    val src = LakeTable(spark, scratchDir("ivsrc4"))
    src.append(Seq(("a", 1.0)).toDF("k", "v"))
    val view = IncrementalAggView(src, scratchDir("ivview4"), Seq("k"), Seq("v"))
    val v1 = view.refresh()
    assert(view.refresh() == v1) // current: zero work, same version
    src.append(Seq(("b", 3.0)).toDF("k", "v"))
    src.expireSnapshots(keepLast = 1) // the refresh baseline manifest is gone
    view.refresh()
    val got = view.read().select($"k", $"n_rows", $"sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("a", 1L, 1.0), ("b", 1L, 3.0)))
  }
}
