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
