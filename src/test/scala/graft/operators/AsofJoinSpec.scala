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

  private def directedFixture = {
    val trades = Seq(
      (1L, "A", mk("2024-01-01 10:00:00")), // exactly at a quote -> both directions match it
      (2L, "A", mk("2024-01-01 10:01:00")), // 60s after q1, 240s before q2 -> nearest = q1
      (3L, "A", mk("2024-01-01 10:04:00")), // 240s after q1, 60s before q2 -> nearest = q2
      (4L, "A", mk("2024-01-01 10:02:30")), // exact midpoint -> tie resolves BACKWARD (q1)
      (5L, "A", mk("2024-01-01 09:00:00")), // before any quote -> forward q1, backward NULL
      (6L, "A", mk("2024-01-01 11:00:00"))) // after all quotes -> forward NULL, backward q2
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", mk("2024-01-01 10:00:00"), 100.0),
      ("A", mk("2024-01-01 10:05:00"), 101.0))
      .toDF("sym", "qts", "price")
    (trades, quotes)
  }

  test("directed backward reproduces asofJoin exactly") {
    val (trades, quotes) = directedFixture
    val a = Ops.asofJoin(trades, quotes, "sym", "ts", "qts", Seq("price"))
      .orderBy("trade_id").collect().toSeq
    val b = Ops.asofJoinDirected(trades, quotes, "sym", "ts", "qts", Seq("price"))
      .orderBy("trade_id").collect().toSeq
    assert(a == b)
  }

  test("directed forward picks the earliest at-or-after, inclusive at ties") {
    val (trades, quotes) = directedFixture
    val out = Ops.asofJoinDirected(
      trades, quotes, "sym", "ts", "qts", Seq("price"), direction = "forward")
      .orderBy("trade_id").collect()
    def price(i: Int) = out(i).getAs[java.lang.Double]("price")
    assert(price(0) == 100.0) // inclusive at equal ts
    assert(price(1) == 101.0)
    assert(price(2) == 101.0)
    assert(price(3) == 101.0)
    assert(price(4) == 100.0) // before all -> first quote
    assert(out(5).isNullAt(out(5).fieldIndex("price"))) // after all -> none
  }

  test("directed nearest picks the closer side; exact tie resolves backward") {
    val (trades, quotes) = directedFixture
    val out = Ops.asofJoinDirected(
      trades, quotes, "sym", "ts", "qts", Seq("price"), direction = "nearest")
      .orderBy("trade_id").collect()
    def price(i: Int) = out(i).getAs[java.lang.Double]("price")
    assert(price(0) == 100.0) // distance 0 both ways -> backward
    assert(price(1) == 100.0) // 60s back vs 240s forward
    assert(price(2) == 101.0) // 240s back vs 60s forward
    assert(price(3) == 100.0) // exact 150s tie -> BACKWARD
    assert(price(4) == 100.0) // only forward exists
    assert(price(5) == 101.0) // only backward exists
  }

  test("a matched right row with NULL payload carries that null — never an older row's value") {
    // pandas merge_asof carries the MATCHED row's values, nulls
    // included; per-column ignoreNulls carries (pre-r20) pulled the
    // null field from the previous quote and then judged it against
    // the wrong matched timestamp (ADVICE r19)
    val trades = Seq(
      (1L, "A", mk("2024-01-01 10:06:00")), // after q2 (null price) -> must carry NULL, not q1's 100.0
      (2L, "A", mk("2024-01-01 10:01:00"))) // between q1 and q2 -> q1's 100.0
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", mk("2024-01-01 10:00:00"), Some(100.0), "m1"),
      ("A", mk("2024-01-01 10:05:00"), None, "m2"))
      .toDF("sym", "qts", "price", "mark")
    val out = Ops.asofJoinDirected(trades, quotes, "sym", "ts", "qts", Seq("price", "mark"))
      .orderBy("trade_id").collect()
    // trade 1 matches q2: price NULL (q2's), mark m2 — both from q2
    assert(out(0).isNullAt(out(0).fieldIndex("price")), out(0).toString)
    assert(out(0).getAs[String]("mark") == "m2")
    assert(out(1).getAs[Double]("price") == 100.0)
    assert(out(1).getAs[String]("mark") == "m1")
    // and with a tolerance tighter than the q1 gap, trade 1 still
    // matches q2 (60s away): the null payload must NOT be masked in
    // by q1's timestamp, nor the match judged against q1's distance
    val tol = Ops.asofJoinDirected(
      trades, quotes, "sym", "ts", "qts", Seq("price", "mark"),
      toleranceSeconds = Some(90.0))
      .orderBy("trade_id").collect()
    assert(tol(0).isNullAt(tol(0).fieldIndex("price")))
    assert(tol(0).getAs[String]("mark") == "m2") // within 60s -> kept
    assert(tol(1).getAs[Double]("price") == 100.0)
  }

  test("tolerance nulls matches farther than the bound, in any direction") {
    val (trades, quotes) = directedFixture
    val out = Ops.asofJoinDirected(
      trades, quotes, "sym", "ts", "qts", Seq("price"),
      direction = "nearest", toleranceSeconds = Some(90.0))
      .orderBy("trade_id").collect()
    def isNull(i: Int) = out(i).isNullAt(out(i).fieldIndex("price"))
    assert(!isNull(0)) // d=0
    assert(!isNull(1)) // d=60
    assert(!isNull(2)) // d=60
    assert(isNull(3))  // d=150 > 90
    assert(isNull(4))  // d=3600
    assert(isNull(5))  // d=3300
  }
}
