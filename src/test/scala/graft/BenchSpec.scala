package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

class BenchSpec extends SparkSpec {

  test("a throwing query lands in the failed list, not in a fast-looking wall time") {
    val ok: (SparkSession, String) => DataFrame = (s, _) => {
      import s.implicits._
      Seq((1, "a")).toDF("k", "v")
    }
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("synthetic failure: table missing")
    val (results, failed) = Bench.measure(spark, "unused", Seq("q_ok" -> ok, "q_boom" -> boom))
    assert(results.map(_._1) == Seq("q_ok", "q_boom"))
    assert(failed.map(_._1) == Seq("q_boom"), s"failed=$failed")
    assert(failed.head._2.contains("IllegalStateException"), failed.head._2)
    assert(failed.head._2.contains("synthetic failure"), failed.head._2)
  }

  test("jsonStr escapes quotes, backslashes, and control characters") {
    assert(Bench.jsonStr("he said \"hi\"\\ and") == "\"he said \\\"hi\\\"\\\\ and\"")
    assert(Bench.jsonStr("a\nb\tc") == "\"a\\nb\\tc\"")
    assert(Bench.jsonStr("x" + 1.toChar) == "\"x\\u0001\"")
  }
}
