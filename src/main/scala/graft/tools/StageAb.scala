package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r22): same-JVM alternating A/B of the streaming
  * staging write — single-task plain write vs bounded input widen —
  * over the sf events table. Usage: runMain graft.tools.StageAb <sfDir>
  */
object StageAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val input = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("ts"), col("event_type"), col("user_id"))
    val keyCols = Seq("event_type", "event_id")
    val fmt = Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    def envelope(df: DataFrame): DataFrame = df.select(
      concat_ws("_", keyCols.map(col): _*).as("key"),
      to_json(struct(df.columns.map(col): _*), fmt).as("value"))
    def plain(dir: String): Unit =
      envelope(input).write.mode("append").parquet(dir)
    def widened(dir: String): Unit =
      envelope(input.repartition(4)).write.mode("append").parquet(dir)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"LEG $label%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = graft.util.TempDirs.scratch("stageab")
    time("warm-plain")(plain(s"$base/w1"))
    time("warm-widen")(widened(s"$base/w2"))
    (1 to 3).foreach { i =>
      time(s"plain-$i")(plain(s"$base/p$i"))
      time(s"widen-$i")(widened(s"$base/v$i"))
    }
    spark.stop()
  }
}
