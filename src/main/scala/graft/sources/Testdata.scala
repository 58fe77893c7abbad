package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Sessions.tablePath

/** Readers for the driver-generated testdata corpus (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
  * does not read natively (PARQUET_TYPE_ILLEGAL); the documented escape
  * hatch is `spark.sql.legacy.parquet.nanosAsLong`, which surfaces the
  * column as nanos-since-epoch LongType. We convert to TimestampType by
  * truncating to micros — the same conversion DuckDB applies when it
  * reads the file — so both engines see identical values.
  */
object Testdata {

  def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    table match {
      case "events" => events(spark, sfDir)
      case t => spark.read.parquet(tablePath(sfDir, t))
    }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(tablePath(sfDir, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
