package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Iceberg-style PARTITION EVOLUTION: commits written under different
  * partition layouts coexist in one table — each commit dir keeps its
  * own hive layout, readers reconstruct partition columns per dir, and
  * later queries see one uniform schema.
  */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("append under a changed partitionBy keeps old dirs readable and columns whole") {
    val t = LakeTable(spark, scratchDir("pevo"))
    val df = (1 to 20).map(i => (i, s"m${i % 3}", s"d${i % 5}", i * 1.0)).toDF("id", "month", "day", "v")
    t.append(df.filter($"id" <= 10), partitionBy = Seq("month"))
    t.append(df.filter($"id" > 10), partitionBy = Seq("day"))
    val r = t.read()
    assert(r.columns.toSet == Set("id", "month", "day", "v"))
    assert(r.count() == 20)
    val got = r.select($"id", $"month", $"day")
      .orderBy("id").collect().map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSeq
    val want = (1 to 20).map(i => (i, s"m${i % 3}", s"d${i % 5}"))
    assert(got == want)
    assert(r.filter($"day" === "d1").count() == 4)
  }
}
