package graft.operators

import graft.SparkSpec
import graft.operators.Expectations.{Drop, Expectation, Fail, Warn}
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, "ok", 5.0),
    (2, "ok", -1.0),      // violates positive
    (3, "bad", 5.0),      // violates type
    (4, "bad", -2.0),     // violates both
    (5, "ok", 500.0)      // violates warn-only bound
  ).toDF("id", "kind", "v")

  private val exps = Seq(
    Expectation("valid_kind", col("kind") =!= "bad", Drop),
    Expectation("positive", col("v") > 0, Drop),
    Expectation("bounded", col("v") <= 400, Warn))

  test("drop quarantines, warn passes through, counts cover every expectation") {
    val res = Expectations.check(df, exps)
    assert(res.kept.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 5))
    val q = res.quarantined.collect()
      .map(r => r.getInt(0) -> r.getSeq[String](r.fieldIndex("_violations")).toSet)
      .toMap
    assert(q == Map(
      2 -> Set("positive"),
      3 -> Set("valid_kind"),
      4 -> Set("valid_kind", "positive")))
    assert(res.violationCounts == Map("valid_kind" -> 2L, "positive" -> 2L, "bounded" -> 1L))
  }

  test("fail aborts the batch when any row violates; passes when none do") {
    val e = intercept[IllegalStateException] {
      Expectations.check(df, Seq(Expectation("positive", col("v") > 0, Fail)))
    }
    assert(e.getMessage.contains("positive"))
    // no violation: the same gate passes and keeps everything
    val res = Expectations.check(
      df.filter($"v" > 0), Seq(Expectation("positive", col("v") > 0, Fail)))
    assert(res.kept.count() == 3 && res.quarantined.isEmpty)
  }

  test("NULL predicate results are violations, not passes") {
    val withNull = Seq((1, Some(2.0)), (2, None)).toDF("id", "v")
    val res = Expectations.check(withNull, Seq(Expectation("v_pos", col("v") > 0, Drop)))
    assert(res.kept.collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(res.violationCounts("v_pos") == 1L)
  }
}
