package graft.tools

/** Scratch diagnostic: print run time (cold + warm) and the executed
  * plan for one `SparkEntry` query at a given sf directory. Usage:
  * runMain graft.tools.ExplainQ <queryName> <sfDir>
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val Array(q, sfDir) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    val t0 = System.nanoTime()
    df.count()
    println(f"FIRST ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    df.count()
    println(f"SECOND ${(System.nanoTime() - t1) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
