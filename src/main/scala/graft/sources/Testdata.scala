package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.Sessions.tablePath

/** Readers for the driver-generated testdata corpus (TESTDATA.md).
  *
  * `events.parquet` has shipped with two different `ts` encodings across
  * testdata generations, so the reader probes the parquet footer and
  * branches:
  *
  *   - parquet TIMESTAMP(NANOS): Spark can't read it natively
  *     (PARQUET_TYPE_ILLEGAL); the documented escape hatch
  *     `spark.sql.legacy.parquet.nanosAsLong` surfaces the column as
  *     nanos-since-epoch LongType, which we truncate to micros — the same
  *     conversion DuckDB applies — so both engines see identical values.
  *     The conf is set ONLY on this path, and stays set for the session
  *     (it is read lazily at scan execution, so a save/restore scope
  *     around the read would un-set it before the frame ever runs).
  *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark surfaces it
  *     as TIMESTAMP_NTZ; we cast to session-TZ TimestampType (sessions pin
  *     `spark.sql.session.timeZone=UTC`, so the wall-clock values are
  *     preserved bit-for-bit and match DuckDB's reading of the file).
  *
  * Columns already TimestampType (MICROS/MILLIS, isAdjustedToUTC=true)
  * pass through untouched. Keeping the session strict on non-nanos data
  * means an unrelated reader hitting a nanos file still fails loudly
  * instead of silently computing on raw longs.
  */
object Testdata {

  def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    table match {
      case "events" => events(spark, sfDir)
      case t => spark.read.parquet(tablePath(sfDir, t))
    }

  /** Does any `ts` column in the footprint carry TIMESTAMP(NANOS)?
    * Probes one parquet footer under `path` (file or directory) with
    * parquet-hadoop directly — cheap, and independent of the Spark
    * conf whose value the answer decides.
    *
    * Contract: local-filesystem paths with a UNIFORM ts encoding across
    * part files (true of the driver-generated testdata this reads; a
    * remote URI would need the Hadoop FileSystem API instead of
    * java.nio). The probed file is the lexicographically first .parquet
    * so the answer is deterministic regardless of directory-walk order.
    */
  private def hasNanosTs(spark: SparkSession, path: String): Boolean = {
    val p = java.nio.file.Paths.get(path)
    val file =
      if (java.nio.file.Files.isDirectory(p)) {
        // recurse: a partitioned layout keeps its part files in subdirs
        val walk = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          val candidates = walk.iterator().asScala.filter { c =>
            c.toString.endsWith(".parquet") && java.nio.file.Files.isRegularFile(c)
          }
          if (candidates.isEmpty) return false
          candidates.minBy(_.toString)
        } finally walk.close()
      } else p
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file.toString), new Configuration()))
    try {
      val fields = reader.getFileMetaData.getSchema.getFields
      (0 until fields.size()).exists { i =>
        val f = fields.get(i)
        f.getName == "ts" && (f.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == TimeUnit.NANOS
          case _ => false
        })
      }
    } finally reader.close()
  }

  /** Events table reader, branching on the parquet ts encoding (see
    * [[hasNanosTs]]). Note: the first nanos-encoded read flips
    * `spark.sql.legacy.parquet.nanosAsLong` on for the REST of the
    * session — strict fail-loudly behavior for unrelated raw nanos
    * reads holds only until that first call; afterwards they decode as
    * LongType like any legacy read.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val path = tablePath(sfDir, "events")
    if (hasNanosTs(spark, path))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long escape hatch: truncate to micros
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // micros NTZ: reinterpret in session TZ (UTC)
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
