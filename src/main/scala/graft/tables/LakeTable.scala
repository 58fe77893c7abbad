package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** A minimal lakehouse table: parquet data + a JSON commit log.
  *
  * Rebuilds the Iceberg behaviors the reference relies on
  * (/root/reference/docker/init/lakehouse_init.sql,
  * /root/reference/src/bronze/_bronze_utils.py:60-66) without the Iceberg
  * runtime: atomic append/overwrite commits, snapshot listing, and
  * time-travel reads — the published Delta/Iceberg design (a log of
  * manifests naming immutable data files) at library scale.
  *
  * Layout:
  * {{{
  *   <root>/data/<commit-uuid>/            parquet files (optionally
  *                                         Hive-partitioned subdirs)
  *   <root>/_graft_log/v<00000N>.json      manifest: full list of live
  *                                         commit dirs at version N
  * }}}
  *
  * Every manifest is a *complete* snapshot (lists all live commit dirs),
  * so a reader needs exactly one log file. Commits are atomic via
  * write-to-temp + rename; concurrent writers are out of scope
  * (the reference DAG is sequential — SequentialExecutor,
  * /root/reference/docker-compose.yml:12).
  *
  * Scale note: data files are immutable and listed by manifest, never by
  * directory scan, so reads are O(log) not O(listing) — the property that
  * makes this design work on object stores. Partition columns are
  * preserved through `basePath`, so partition pruning on
  * (ingest_year, ingest_month) style layouts works exactly as with a
  * Hive table.
  */
final class LakeTable(val spark: SparkSession, val root: String) {
  import LakeTable._

  private val logDir: Path = Paths.get(root, "_graft_log")
  private val dataDir: Path = Paths.get(root, "data")

  // ---- log primitives -----------------------------------------------------

  private def versionOf(p: Path): Long = {
    val n = p.getFileName.toString
    n.stripPrefix("v").stripSuffix(".json").toLong
  }

  private def listVersions(): Seq[Path] =
    if (!Files.isDirectory(logDir)) Seq.empty
    else
      Files
        .list(logDir)
        .iterator()
        .asScala
        .filter(p => p.getFileName.toString.matches("v\\d+\\.json"))
        .toSeq
        .sortBy(versionOf)

  def latestVersion(): Option[Long] = listVersions().lastOption.map(versionOf)

  private def readManifest(version: Long): Manifest = {
    val p = logDir.resolve(f"v$version%020d.json")
    Manifest.fromJson(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  private def writeManifest(m: Manifest): Unit = {
    Files.createDirectories(logDir)
    val target = logDir.resolve(f"v${m.version}%020d.json")
    if (Files.exists(target))
      throw new IllegalStateException(
        s"concurrent write detected: version ${m.version} already exists at $target")
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.write(tmp, m.toJson.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }

  def exists: Boolean = latestVersion().isDefined

  def isEmpty: Boolean =
    latestVersion().forall(v => readManifest(v).commitDirs.isEmpty)

  // ---- writes -------------------------------------------------------------

  /** Write `df`'s rows as a new immutable commit dir; return its relative
    * name (empty input still commits an empty dir entry-less manifest).
    */
  private def writeCommitDir(df: DataFrame, partitionBy: Seq[String]): Option[String] = {
    val commitName = s"commit-${UUID.randomUUID()}"
    val dest = dataDir.resolve(commitName)
    val writer = df.write.mode("overwrite")
    val w = if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    w.parquet(dest.toString)
    Some(commitName)
  }

  private def commit(
      op: String,
      newDirs: Seq[String],
      keepExisting: Boolean,
      schema: StructType,
      partitionBy: Seq[String]): Long = {
    val prev = latestVersion().map(readManifest)
    val version = prev.map(_.version + 1).getOrElse(0L)
    val existing = if (keepExisting) prev.map(_.commitDirs).getOrElse(Seq.empty) else Seq.empty
    val parts = if (partitionBy.nonEmpty) partitionBy else prev.map(_.partitionBy).getOrElse(Seq.empty)
    writeManifest(
      Manifest(version, op, System.currentTimeMillis(), existing ++ newDirs, schema.json, parts))
    version
  }

  /** Append rows (bronze/gold append sink — K1/K4). */
  def append(df: DataFrame, partitionBy: Seq[String] = Seq.empty): Long = {
    val dirs = writeCommitDir(df, partitionBy).toSeq
    commit("append", dirs, keepExisting = true, df.schema, partitionBy)
  }

  /** Replace the table contents atomically (merge rewrites land here). */
  def overwrite(df: DataFrame, partitionBy: Seq[String] = Seq.empty): Long = {
    val dirs = writeCommitDir(df, partitionBy).toSeq
    commit("overwrite", dirs, keepExisting = false, df.schema, partitionBy)
  }

  // ---- reads --------------------------------------------------------------

  /** Read the table at `versionAsOf` (latest when None) — time travel. */
  def read(versionAsOf: Option[Long] = None): DataFrame = {
    val v = versionAsOf.orElse(latestVersion()).getOrElse {
      throw new IllegalStateException(s"table at $root has no commits")
    }
    val m = readManifest(v)
    val schema = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
    if (m.commitDirs.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else if (m.partitionBy.isEmpty) {
      val paths = m.commitDirs.map(d => dataDir.resolve(d).toString)
      spark.read.schema(schema).parquet(paths: _*)
    } else {
      // Hive-partitioned commits: each commit dir is its own partition
      // root (basePath), so partition columns resolve per commit and the
      // union preserves them. Commit counts stay small because merges
      // rewrite (compact) the table; a production variant would also
      // compact append-heavy histories.
      m.commitDirs
        .map(d => spark.read.option("basePath", dataDir.resolve(d).toString)
          .schema(schema).parquet(dataDir.resolve(d).toString))
        .reduce(_ unionByName _)
    }
  }

  /** Snapshot history (the reference queries `table.snapshots` —
    * /root/reference/experiments/trino_iceberg_example.sql:40).
    */
  def snapshots(): DataFrame = {
    import spark.implicits._
    listVersions()
      .map(p => readManifest(versionOf(p)))
      .map(m => (m.version, new java.sql.Timestamp(m.timestampMs), m.operation, m.commitDirs.size))
      .toDF("version", "committed_at", "operation", "num_commit_dirs")
  }

  /** Compaction: rewrite the current snapshot as one commit dir (an
    * `overwrite` of the table with itself). Append-heavy histories
    * accumulate commit dirs, each a separate partition-root read —
    * compaction restores O(1) read planning; history stays time-travel
    * readable (old manifests keep their dirs).
    */
  def compact(): Long = {
    val prev = latestVersion().map(readManifest)
    overwrite(read(), prev.map(_.partitionBy).getOrElse(Seq.empty))
  }

  /** High-watermark incremental scan (S5/S6 —
    * /root/reference/src/silver/_silver_utils.py:35-49): full source when
    * this table is empty, else strictly-greater-than the max of `tsCol`
    * already landed here. The strict `>` (not `>=`) is a documented
    * reference behavior (SURVEY §7.5.5).
    */
  def incrementalFrom(source: DataFrame, tsCol: String): DataFrame = {
    if (!exists || isEmpty) source
    else {
      val hwmRow = read().agg(max(col(tsCol))).head()
      if (hwmRow.isNullAt(0)) source
      else source.filter(col(tsCol) > lit(hwmRow.get(0)))
    }
  }
}

object LakeTable {
  def apply(spark: SparkSession, root: String): LakeTable = new LakeTable(spark, root)

  /** One manifest = one table version. Hand-rolled JSON (no external
    * deps); schema is Spark's own StructType.json.
    */
  final case class Manifest(
      version: Long,
      operation: String,
      timestampMs: Long,
      commitDirs: Seq[String],
      schemaJson: String,
      partitionBy: Seq[String]) {

    def toJson: String = {
      def qs(s: String) = "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      s"""{"version":$version,"operation":${qs(operation)},"timestampMs":$timestampMs,""" +
        s""""commitDirs":[${commitDirs.map(qs).mkString(",")}],""" +
        s""""partitionBy":[${partitionBy.map(qs).mkString(",")}],""" +
        s""""schema":${qs(schemaJson)}}"""
    }
  }

  object Manifest {
    /** Tiny purpose-built parser for the exact shape `toJson` emits. */
    def fromJson(s: String): Manifest = {
      // Use Spark's bundled Jackson to avoid a hand-rolled parser.
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(s)
      def strings(field: String): Seq[String] = {
        val arr = node.get(field)
        (0 until arr.size()).map(i => arr.get(i).asText())
      }
      Manifest(
        node.get("version").asLong(),
        node.get("operation").asText(),
        node.get("timestampMs").asLong(),
        strings("commitDirs"),
        node.get("schema").asText(),
        strings("partitionBy"))
    }
  }
}
