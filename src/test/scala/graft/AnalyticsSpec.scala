package graft

/** Approximate aggregates: the sketch must stay within its documented
  * error envelope against the exact answer.
  */
class AnalyticsSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact distinct counts") {
    val rows = queries.AnalyticsQueries
      .approxDistinct(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }
}
