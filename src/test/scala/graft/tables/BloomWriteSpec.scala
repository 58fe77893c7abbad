package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins parquet bloom-filter writing on lake-table appends: the footer
  * must actually carry a bloom filter for the requested column (offset
  * recorded per row group), plain appends must not pay for one, and an
  * equality probe over bloom-written files must return exactly the
  * same rows — the filter is a row-group skip index, never a row
  * filter.
  */
class BloomWriteSpec extends SparkSpec {

  private def df = {
    val sql = spark
    import sql.implicits._
    (1L to 2000L).map(i => (i, s"name_$i", i % 7)).toDF("id", "name", "grp")
  }

  /** Bloom-filter presence per column across every data file+row group. */
  private def bloomColumns(root: String): Set[String] = {
    val conf = new Configuration()
    val files = java.nio.file.Files
      .walk(java.nio.file.Paths.get(root))
      .iterator()
      .asScala
      .filter(p => p.toString.endsWith(".parquet") && !p.toString.contains("_log"))
      .toSeq
    assert(files.nonEmpty, s"no parquet files under $root")
    files.flatMap { p =>
      val reader =
        ParquetFileReader.open(HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p.toString), conf))
      try reader.getFooter.getBlocks.asScala.flatMap(b =>
        b.getColumns.asScala
          .filter(_.getBloomFilterOffset >= 0)
          .map(_.getPath.toDotString))
      finally reader.close()
    }.toSet
  }

  test("bloom-enabled append records a filter for exactly the requested column") {
    val root = scratchDir("bloom-on")
    val t = LakeTable(spark, root)
    t.append(df, writeOptions = LakeTable.bloomFilterOptions(Seq("id"), ndv = 2000L))
    assert(bloomColumns(s"$root/data") == Set("id"))
  }

  test("plain append writes no bloom filters") {
    val root = scratchDir("bloom-off")
    val t = LakeTable(spark, root)
    t.append(df)
    assert(bloomColumns(s"$root/data").isEmpty)
  }

  test("equality and IN probes over bloom-written files return exact rows") {
    val root = scratchDir("bloom-read")
    val t = LakeTable(spark, root)
    t.append(df, writeOptions = LakeTable.bloomFilterOptions(Seq("id"), ndv = 2000L))
    // second commit WITHOUT blooms: mixed files must still read uniformly
    t.append(
      spark.range(2001, 2501).toDF("id")
        .select(col("id"), concat(lit("name_"), col("id")).as("name"), (col("id") % 7).as("grp")))
    val hit = t.read().filter(col("id") === 1234L).collect()
    assert(hit.map(_.getString(1)).toSeq == Seq("name_1234"))
    val in = t.read().filter(col("id").isin(5L, 2250L, 9999L)).orderBy("id").collect()
    assert(in.map(_.getLong(0)).toSeq == Seq(5L, 2250L))
    assert(t.read().count() == 2500L)
  }
}
