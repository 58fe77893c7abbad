package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.Sessions.tablePath

/** Readers for the driver-generated testdata corpus (TESTDATA.md).
  *
  * `events.parquet` has shipped with two different `ts` encodings across
  * testdata generations, so the reader branches on the *loaded* type:
  *
  *   - parquet TIMESTAMP(NANOS): Spark can't read it natively
  *     (PARQUET_TYPE_ILLEGAL); with the documented escape hatch
  *     `spark.sql.legacy.parquet.nanosAsLong` the column surfaces as
  *     nanos-since-epoch LongType, which we truncate to micros — the same
  *     conversion DuckDB applies — so both engines see identical values.
  *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark surfaces it
  *     as TIMESTAMP_NTZ; we cast to session-TZ TimestampType (sessions pin
  *     `spark.sql.session.timeZone=UTC`, so the wall-clock values are
  *     preserved bit-for-bit and match DuckDB's reading of the file).
  *
  * Columns already TimestampType (MICROS/MILLIS, isAdjustedToUTC=true)
  * pass through untouched. Setting `nanosAsLong` is harmless on non-nanos
  * files — the type branch below keys on what actually loaded.
  */
object Testdata {

  def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    table match {
      case "events" => events(spark, sfDir)
      case t => spark.read.parquet(tablePath(sfDir, t))
    }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(tablePath(sfDir, "events"))
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long escape hatch: truncate to micros
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // micros NTZ: reinterpret in session TZ (UTC)
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
