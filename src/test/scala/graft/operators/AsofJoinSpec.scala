package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mk(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before, per key, inclusive at ties") {
    val trades = Seq(
      (1L, "A", mk("2024-01-01 10:00:00")), // exactly at a quote -> inclusive match
      (2L, "A", mk("2024-01-01 10:04:59")), // between quotes -> earlier quote
      (3L, "A", mk("2024-01-01 09:00:00")), // before any quote -> NULL
      (4L, "B", mk("2024-01-01 10:10:00"))) // other key
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", mk("2024-01-01 10:00:00"), 100.0),
      ("A", mk("2024-01-01 10:05:00"), 101.0),
      ("B", mk("2024-01-01 10:00:00"), 50.0))
      .toDF("sym", "qts", "price")

    val out = Ops.asofJoin(trades, quotes, "sym", "ts", "qts", Seq("price"))
      .orderBy("trade_id").collect()
    assert(out.length == 4)
    assert(out(0).getAs[Double]("price") == 100.0)
    assert(out(1).getAs[Double]("price") == 100.0)
    assert(out(2).isNullAt(out(2).fieldIndex("price")))
    assert(out(3).getAs[Double]("price") == 50.0)
  }

  test("asofJoin rejects payload/left column collisions") {
    val l = Seq((1, mk("2024-01-01 00:00:00"))).toDF("v", "ts")
    val r = Seq((1, mk("2024-01-01 00:00:00"), 2)).toDF("k", "rts", "v")
    intercept[IllegalArgumentException] {
      Ops.asofJoin(l, r, "v", "ts", "rts", Seq("v"))
    }
  }
}
