package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeSchema casts, adds missing as typed NULL, keeps extras (silver)") {
    val df = Seq(("1", "x", 9)).toDF("a", "b", "extra")
    val target = StructType(Seq(
      StructField("a", IntegerType),
      StructField("b", StringType),
      StructField("missing", DoubleType)))
    val out = Ops.normalizeSchema(df, target, keepExtra = true)
    assert(out.columns.toSeq == Seq("a", "b", "missing", "extra"))
    assert(out.schema("a").dataType == IntegerType)
    val row = out.head()
    assert(row.getAs[Int]("a") == 1 && row.isNullAt(2) && row.getAs[Int]("extra") == 9)
  }

  test("normalizeSchema drops extras (gold)") {
    val df = Seq(("1", "x", 9)).toDF("a", "b", "extra")
    val target = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    assert(Ops.normalizeSchema(df, target, keepExtra = false).columns.toSeq == Seq("a", "b"))
  }

  test("renameCols only renames columns present") {
    val out = Ops.renameCols(Seq((1, 2)).toDF("a", "b"), Map("a" -> "x", "nope" -> "y"))
    assert(out.columns.toSeq == Seq("x", "b"))
  }

  test("handleString trims; handleNumeric nulls non-positives; handleNull drops") {
    val df = Seq(("  pad  ", 5.0), ("ok", -1.0), ("ok", 0.0)).toDF("s", "v")
    val cleaned = Ops.handleNull(
      Ops.handleNumeric(Ops.handleString(df, Seq("s")), Seq("v")),
      dropCols = Seq("v"))
    val rows = cleaned.collect()
    assert(rows.length == 1 && rows(0).getString(0) == "pad" && rows(0).getDouble(1) == 5.0)
  }

  test("deduplicate keeps highest orderCol per key with deterministic tie-break") {
    val df = Seq(
      (1, 10, "old"), (1, 20, "new"), (1, 20, "tie-lower"),
      (2, 5, "only")).toDF("k", "ord", "tag")
      .withColumn("tie", when(col("tag") === "new", 2).otherwise(1))
    val out = Ops.deduplicate(df, Seq("k"), "ord", Seq("tie")).orderBy("k").collect()
    assert(out.map(_.getAs[String]("tag")).toSeq == Seq("new", "only"))
  }

  test("joinDimIterated flattens levels with left semantics and NULL for unmatched") {
    val fact = Seq((1, 10, 99)).toDF("id", "code_1", "code_2")
    val dim = Seq((10, "ten"), (11, "eleven")).toDF("code", "name")
    val out = Ops.joinDimIterated(fact, dim, "code", Seq("name"), Seq("code_1" -> "_1", "code_2" -> "_2"))
    val row = out.head()
    assert(row.getAs[String]("name_1") == "ten")
    assert(row.isNullAt(out.columns.indexOf("name_2")))
    assert(!out.columns.contains("code_1") && !out.columns.contains("code"))
  }

  test("jsonEnvelope encode/decode round-trips payload and builds composite key") {
    val df = Seq((7L, "click", 1.5)).toDF("id", "kind", "v")
    val env = Ops.jsonEnvelopeEncode(df, Seq("kind", "id"))
    assert(env.head().getAs[String]("key") == "click_7")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("kind", StringType), StructField("v", DoubleType)))
    val back = Ops.jsonEnvelopeDecode(env, "value", schema)
    assert(back.head() == Row(7L, "click", 1.5))
  }

  test("addMetadata stamps fixed clock, date parts and batch id") {
    val ts = java.sql.Timestamp.valueOf("2021-03-04 05:06:07")
    val out = Ops.addMetadata(Seq(1).toDF("x"), Some(ts), dateParts = true, Some("b-1"))
    val row = out.head()
    assert(row.getAs[Int]("ingest_year") == 2021)
    assert(row.getAs[Int]("ingest_month") == 3)
    assert(row.getAs[Int]("ingest_day") == 4)
    assert(row.getAs[String]("batch_id") == "b-1")
  }
}
