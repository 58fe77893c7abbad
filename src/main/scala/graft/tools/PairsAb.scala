package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r22): same-JVM alternating A/B of the C(k,2)
  * pair-expansion forms over the triangle edge build's grouped input —
  * interpreted nested-transform HOF vs the compiled
  * [[graft.functions.VectorExprs.SortedPairs]] expression. The grouped
  * per-order array frame is built once and persisted so the timed legs
  * measure ONLY expansion + distinct. Usage: runMain graft.tools.PairsAb <sfDir>
  */
object PairsAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val grouped = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o")).agg(array_sort(array_distinct(collect_list(col("p")))).as("ps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"grouped rows: ${grouped.count()}")

    def hof(df: DataFrame): DataFrame = df
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS p1, y AS p2))))")).as("e"))
      .select(col("e.p1").as("p1"), col("e.p2").as("p2"))
      .distinct()
    def compiled(df: DataFrame): DataFrame = df
      .select(explode(
        graft.functions.VectorExprs.sortedPairs(spark, col("ps"), "p1", "p2")).as("e"))
      .select(col("e.p1").as("p1"), col("e.p2").as("p2"))
      .distinct()

    def time(label: String, f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"LEG $label%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm both codepaths once, then alternate 3 timed legs each
    time("warm-hof", hof(grouped))
    time("warm-cmp", compiled(grouped))
    (1 to 3).foreach { i =>
      time(s"hof-$i", hof(grouped))
      time(s"cmp-$i", compiled(grouped))
    }
    spark.stop()
  }
}
