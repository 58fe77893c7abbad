package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** SURVEY §7.5.3: the reference pins its sessions to Asia/Ho_Chi_Minh
  * (TIMESTAMP WITH TIME ZONE semantics); our engine takes the session
  * TZ as a parameter. This spec pins the two TZ-sensitive behaviors:
  * wall-clock derivations (hour / date parts) follow the session TZ,
  * while epoch-anchored tumbling windows do not shift.
  */
class TimezoneSpec extends SparkSpec {
  import spark.implicits._

  private def withTz[A](tz: String)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try body
    finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("hour() and date parts follow the session time zone") {
    // 2024-01-01 17:30 UTC = 2024-01-02 00:30 in Asia/Ho_Chi_Minh (+7)
    val df = Seq(Tuple1(Timestamp.valueOf("2024-01-01 17:30:00"))).toDF("ts")
    val utcHour = df.select(hour($"ts")).head().getInt(0)
    assert(utcHour == 17)
    val (vnHour, vnDay) = withTz("Asia/Ho_Chi_Minh") {
      val r = df.select(hour($"ts"), dayofmonth($"ts")).head()
      (r.getInt(0), r.getInt(1))
    }
    assert(vnHour == 0 && vnDay == 2)
  }

  test("tumbling windows stay epoch-anchored across session time zones") {
    val df = Seq((1L, Timestamp.valueOf("2024-01-01 10:07:00"), 1.0)).toDF("id", "ts", "v")
    def windowStartMicros(tz: String): Long = withTz(tz) {
      df.select(window($"ts", "15 minutes").getField("start").cast("long")).head().getLong(0)
    }
    // the same instant lands in the same epoch-aligned window regardless
    // of session TZ (what makes candle results portable across deploys)
    assert(windowStartMicros("UTC") == windowStartMicros("Asia/Ho_Chi_Minh"))
  }
}
