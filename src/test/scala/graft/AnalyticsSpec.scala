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

  test("KMV sketch: exact below k, within error envelope above, partitioning-invariant") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // below k distinct: the buffer holds everything -> exact
    val small = (1 to 100).map(i => (i % 37).toLong).toDF("v")
    def hash = conv(substring(md5(col("v").cast("string")), 1, 15), 16, 10).cast("long")
    val exactSmall = small.agg(graft.functions.Sketches.kmvDistinct(spark, hash, 256)).head.getDouble(0)
    assert(exactSmall == 37.0, s"below-k must be exact, got $exactSmall")
    // above k: standard KMV error ~ 1/sqrt(k) (6.25% at k=256); allow 3 sigma
    val big = (1 to 20000).map(_.toLong).toDF("v")
    val est = big.agg(graft.functions.Sketches.kmvDistinct(spark, hash, 256)).head.getDouble(0)
    assert(math.abs(est - 20000) / 20000.0 <= 0.19, s"est=$est for 20000 distinct")
    // merge path: estimate must not depend on partitioning (map-side
    // partial buffers merge associatively)
    val est2 = big.repartition(13).agg(graft.functions.Sketches.kmvDistinct(spark, hash, 256))
      .head.getDouble(0)
    assert(est == est2, s"partitioning changed the estimate: $est vs $est2")
    // duplicates collapse: distinct of values, not rows
    val dup = big.union(big)
    val est3 = dup.agg(graft.functions.Sketches.kmvDistinct(spark, hash, 256)).head.getDouble(0)
    assert(est3 == est, s"duplicates changed the estimate: $est3 vs $est")
  }

  test("KMV set sketch: sorted k-min set, brute-force-equal, partitioning-invariant") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 256
    val df = (1 to 20000).map(_.toLong).toDF("v")
    def hash = conv(substring(md5(col("v").cast("string")), 1, 15), 16, 10).cast("long")
    def sketchOf(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.agg(graft.functions.Sketches.kmvSet(spark, hash, k)).head.getSeq[Long](0)
    val s = sketchOf(df)
    assert(s.length == k)
    assert(s == s.sorted, "k-min set must be ascending")
    // must equal the brute-force k smallest distinct hashes
    val brute = df.select(hash.as("h")).distinct().orderBy(col("h")).limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(s == brute, "sketch disagrees with brute-force k smallest")
    assert(s == sketchOf(df.repartition(13)), "partitioning changed the set")
    // below k distinct: the set IS the distinct hash set
    val small = (1 to 40).map(_.toLong).toDF("v")
    assert(sketchOf(small).length == 40)
  }

  test("count-min sketch: overestimate-only, exact under no collisions, partitioning-invariant") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = 1024
    def bucket(i: Int, key: org.apache.spark.sql.Column) =
      pmod(
        conv(substring(md5(concat_ws(":", lit(i.toString), key.cast("string"))), 1, 15), 16, 10)
          .cast("long"),
        lit(w.toLong))
    // skewed stream: key k appears k times, k in 1..40 (820 rows, 40 keys)
    val rows = (1 to 40).flatMap(k => Seq.fill(k)(k.toLong))
    val df = rows.toDF("v")
    def sketchOf(d: org.apache.spark.sql.DataFrame): Array[Long] =
      d.agg(graft.functions.Sketches
          .cmsSketch(spark, (0 until 3).map(i => bucket(i, col("v"))), w))
        .head.getSeq[Long](0).toArray
    val sketch = sketchOf(df)
    assert(sketch.length == 3 * w)
    // every row lands once in each of the 3 matrix rows
    (0 until 3).foreach { i =>
      assert(sketch.slice(i * w, (i + 1) * w).sum == rows.length.toLong)
    }
    // probe estimates: min over rows, NEVER below the true count
    val probed = df.distinct()
      .crossJoin(df.agg(graft.functions.Sketches
        .cmsSketch(spark, (0 until 3).map(i => bucket(i, col("v"))), w).as("sketch")))
      .select(
        col("v"),
        least((0 until 3).map(i =>
          element_at(col("sketch"), (lit(i * w) + bucket(i, col("v")) + lit(1)).cast("int"))): _*)
          .as("est"))
      .collect()
    probed.foreach { r =>
      val k = r.getAs[Long]("v")
      val est = r.getAs[Long]("est")
      assert(est >= k, s"CMS underestimated key $k: $est")
    }
    // 40 keys in 1024 buckets: expect exactness for most keys; require
    // the overwhelming majority exact (collision odds per row ~ 4%)
    val exactCount = probed.count(r => r.getAs[Long]("est") == r.getAs[Long]("v"))
    assert(exactCount >= 35, s"only $exactCount/40 probes exact")
    // merge path: matrix must not depend on partitioning
    assert(java.util.Arrays.equals(sketch, sketchOf(df.repartition(13))),
      "partitioning changed the sketch")
  }

  test("approx_percentile stays within its accuracy envelope against exact percentile") {
    import org.apache.spark.sql.functions._
    // relative-rank error <= 1/accuracy (Greenwald-Khanna bound): compare
    // value-at-quantile against exact values at the rank-error-shifted
    // quantiles rather than assuming value-space closeness
    val df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val acc = 100 // error <= 1%
    val r = df.agg(
      expr(s"approx_percentile(l_extendedprice, 0.5, $acc)").as("approx"),
      expr("percentile(l_extendedprice, 0.49)").as("lo"),
      expr("percentile(l_extendedprice, 0.51)").as("hi")).head()
    val (approx, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(approx >= lo && approx <= hi, s"approx=$approx outside [$lo, $hi]")
  }

  test("userSequences orders event types by (ts, event_id) within each user") {
    val rows = queries.AnalyticsQueries
      .userSequences(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // n_events must equal the sequence length for every user
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val seqLen = r.getAs[String]("sequence").split(",").length
      assert(n == seqLen, s"user ${r.get(0)}: n_events=$n but sequence has $seqLen entries")
    }
  }

  test("outliers: every emitted row is beyond 3 sigma and the stats side broadcasts") {
    val df = queries.AnalyticsQueries.outliers(spark, "/root/testdata/sf0.01")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("z")) > 3.0))
    // the group-stats side must join as a broadcast, never a shuffle
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "group-stats join degraded to a shuffle join")
  }

  test("session_window exact-gap boundary: Spark MERGES an event at exactly lastTs+gap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Verified empirically (contra ADVICE r1's half-open claim): Spark's
    // session merge condition is `start <= currentEnd`, so an event at
    // exactly lastTs+gap joins the running session. The DuckDB oracle's
    // island construction therefore correctly uses `<=` on the lag delta.
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      ("u1", ts(0)), ("u1", ts(10)), // exactly 10 min apart -> still ONE session
      ("u2", ts(0)), ("u2", ts(11))  // 11 min apart -> TWO sessions
    ).toDF("user_id", "ts")

    val viaSessionWindow = events
      .groupBy($"user_id", session_window($"ts", "10 minutes"))
      .count()
      .groupBy($"user_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSessionWindow == Map("u1" -> 1L, "u2" -> 2L))

    // the oracle's lag+cumsum island construction with `<=` agrees
    events.createOrReplaceTempView("boundary_events")
    val viaIslands = spark.sql(
      """SELECT user_id, count(DISTINCT session_id) AS n FROM (
        |  SELECT user_id, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS session_id
        |  FROM (
        |    SELECT user_id, ts,
        |           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                     <= INTERVAL 10 MINUTE THEN 0 ELSE 1 END AS new_session
        |    FROM boundary_events))
        |GROUP BY user_id""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaIslands == viaSessionWindow)
  }

  test("bottom-k sample: exact below k, brute-force-equal, partitioning-invariant") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 128
    def hash = conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10).cast("long")
    def sampleOf(d: org.apache.spark.sql.DataFrame): Seq[Double] =
      d.agg(graft.functions.Sketches.bottomKSample(spark, hash, col("v"), k))
        .head.getSeq[Double](0)
    // below k pairs: the sample IS the whole (sorted) value multiset
    val small = (1 to 50).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
    assert(sampleOf(small) == (1 to 50).map(_ * 1.5))
    // above k: must equal the brute-force k smallest by (hash, value)
    val big = (1 to 20000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val s = sampleOf(big)
    assert(s.length == k)
    assert(s == s.sorted, "sample values must come out ascending")
    val brute = big.select(hash.as("h"), col("v")).distinct()
      .orderBy(col("h"), col("v")).limit(k)
      .collect().map(_.getDouble(1)).sorted.toSeq
    assert(s == brute, "sample disagrees with brute-force bottom-k by (hash, value)")
    // merge path: the sample must not depend on partitioning
    assert(s == sampleOf(big.repartition(13)), "partitioning changed the sample")
    // quantile error envelope: uniform 1..20000, rank error ~ 1/sqrt(k)
    // (8.8% at k=128); allow 3x
    val p50 = s.apply(s.length / 2)
    assert(math.abs(p50 - 10000.0) / 20000.0 <= 0.27, s"sample median $p50 too far from 10000")
  }

  test("quantile sketch query: sketch quantiles within rank envelope of exact") {
    val rows = queries.AnalyticsQueries
      .quantileSketch(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // value-space check is distribution-dependent; bound via the exact
      // p50/p90 spread instead: the k=128 sample's p50 must land between
      // exact p50 +- (p90-p50) (a > 3 sigma rank miss at 8.8% rank error)
      val p50s = r.getAs[Double]("p50_sketch")
      val p50e = r.getAs[Double]("p50_exact")
      val p90e = r.getAs[Double]("p90_exact")
      val spread = math.abs(p90e - p50e)
      assert(math.abs(p50s - p50e) <= spread,
        s"${r.getAs[String]("event_type")}: sketch p50 $p50s vs exact $p50e (spread $spread)")
      assert(r.getAs[Long]("sample_n") <= 128)
    }
  }

  test("KMV difference: exact below k and within error envelope vs anti-join") {
    val r = queries.AnalyticsQueries
      .kmvDifference(spark, "/root/testdata/sf0.01")
      .head()
    val est = r.getAs[Double]("diff_est")
    val exact = r.getAs[Long]("exact_diff").toDouble
    // k=64 -> ~12.5% per-sketch error; difference compounds union +
    // membership noise, allow a generous 3x envelope
    assert(exact == 0 || math.abs(est - exact) / exact <= 0.5,
      s"diff_est=$est exact=$exact")
  }

  test("CMS join-size estimate never underestimates and stays near the true size") {
    val r = queries.AnalyticsQueries
      .joinSizeEstimate(spark, "/root/testdata/sf0.01")
      .head()
    val est = r.getAs[Long]("est_size")
    val exact = r.getAs[Long]("exact_size")
    // collisions only add mass: the inner-product estimate is an
    // overestimate of sum_k cA(k)*cB(k), never under
    assert(est >= exact, s"est=$est under exact=$exact")
    // error envelope: E[excess] <= |A|*|B|/w per row, min over d rows
    // tightens; allow a loose 2x of exact as the sanity ceiling here
    assert(exact == 0 || est <= 2 * exact, s"est=$est way over exact=$exact")
  }

  test("fixed-point PageRank: hand-checkable star graph, partitioning-invariant ranks") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the query is oracle-checked end-to-end; here pin the update RULE on
    // a graph small enough to verify by hand: a 3-leaf star (hub 0,
    // leaves 1..3, undirected). deg(hub)=3, deg(leaf)=1.
    //   r0 = 1_000_000 everywhere
    //   hub_1  = 150000 + (3·(1000000 div 1) ·17) div 20 = 2_700_000
    //   leaf_1 = 150000 + ((1000000 div 3)·17) div 20 = 433_333
    //   hub_2  = 150000 + (3·433333·17) div 20  = 1_254_999  (433333·3=1299999)
    //   leaf_2 = 150000 + ((2700000 div 3)·17) div 20 = 915_000
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val nodes = edges.select(col("src").as("node")).distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    def step(r: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val contrib = edges
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst"), expr("rank div out_deg").as("c"))
      nodes
        .join(
          contrib.groupBy(col("dst")).agg(sum(col("c")).as("mass"))
            .withColumnRenamed("dst", "node"),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("mass"), lit(0L)).as("mass"))
        .select(col("node"), (lit(150000L) + expr("(mass * 17) div 20")).as("rank"))
    }
    val r0 = nodes.withColumn("rank", lit(1000000L))
    val r1 = step(r0).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(0L) == 2700000L, s"hub r1: ${r1(0L)}")
    assert(r1(1L) == 433333L && r1(2L) == 433333L && r1(3L) == 433333L, r1)
    val r2 = step(step(r0)).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(0L) == 1254999L, s"hub r2: ${r2(0L)}")
    assert(r2(1L) == 915000L, s"leaf r2: ${r2(1L)}")
    // the full query: deterministic across partitionings (integer sums)
    val a = queries.AnalyticsQueries.pagerankPurchases(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a.length == 20)
    assert(a.map(_._2) == a.map(_._2).sorted.reverse, "top-20 must be rank-descending")
    // suppliers (odd nodes) aggregate many customers: the top of the
    // purchase graph must contain supplier nodes
    assert(a.exists(_._1 % 2 == 1), "no supplier in the top-20")
  }

  test("triangle count: orientation agrees with the brute-force triple join") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val row = queries.AnalyticsQueries.triangleCount(spark, sf).head()
    val (nNodes, nEdges, nTri) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nNodes > 0 && nEdges > 0)
    // structural bounds: a simple graph has at most C(n,2) edges and
    // every triangle needs 3 distinct edges
    assert(nEdges <= nNodes * (nNodes - 1) / 2)
    assert(nTri * 3 >= 0 && nTri <= nEdges * nNodes)
    // brute force: canonical p1<p2 edges, count a<b<c triples with all
    // three edges present — the textbook O(E^1.5)-less definition the
    // oriented plan must reproduce exactly
    val po = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = po.select(col("o"), col("p").as("p1"))
      .join(po.select(col("o"), col("p").as("p2")), Seq("o"))
      .where(col("p1") < col("p2")).select("p1", "p2").distinct()
    e.createOrReplaceTempView("tri_e")
    val brute = spark.sql(
      """SELECT count(*) FROM tri_e e1
        |JOIN tri_e e2 ON e1.p2 = e2.p1
        |JOIN tri_e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2""".stripMargin)
      .head().getLong(0)
    assert(nTri == brute, s"oriented=$nTri brute=$brute")
  }

  test("BFS hops: hop-0 is exactly the seed set; frontiers are disjoint minima") {
    val rows = queries.AnalyticsQueries.bfsHops(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.contains(0L), "seed hop missing")
    val (n0, sum0) = rows(0L)
    // seeds are the even nodes <= 10 (customers 0..5): count <= 6 and
    // the node-id sum of k such seeds is bounded by 0+2+..+10
    assert(n0 >= 1 && n0 <= 6 && sum0 <= 30 && sum0 % 2 == 0, s"($n0, $sum0)")
    // bipartite graph: odd hops land on supplier (odd) nodes, so a
    // frontier of k nodes at hop 1 has an odd-parity sum iff k is odd
    rows.get(1L).foreach { case (n1, s1) => assert((s1 % 2 == 1) == (n1 % 2 == 1)) }
    // hop counts are minima over a finite graph: every hop present is
    // contiguous from 0 (a non-empty hop h needs a non-empty h-1)
    val hops = rows.keySet
    assert(hops == (0L until hops.size).toSet, s"non-contiguous: $hops")
  }

  test("BFS bloom pre-prune (forced) is result-identical to the plain anti-join") {
    // bloomPruneAt = 0 forces the bloom path from round 1 — `false` from
    // might_contain must be exact and positives still anti-join, so the
    // two plans are semantically the same query
    val plain = queries.AnalyticsQueries.bfsHops(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val bloomed = queries.AnalyticsQueries
      .bfsHops(spark, "/root/testdata/sf0.001", bloomPruneAt = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(bloomed == plain, s"bloom path diverged: $bloomed vs $plain")
  }

  test("MAD outliers: robust stats flag fewer-or-equal rows than a zero-MAD degenerate") {
    val rows = queries.AnalyticsQueries
      .outlierMad(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_total")
      val out = r.getAs[Long]("n_outliers")
      assert(out >= 0 && out <= n)
      // MAD is a median of absolute deviations: non-negative by construction
      assert(r.getAs[Double]("mad") >= 0.0)
      // a 3*1.4826*MAD fence on any distribution keeps at least half the
      // mass inside (deviations below the median deviation never flag)
      assert(out <= n / 2, s"${r.getAs[String]("event_type")}: $out of $n flagged")
    }
  }
}
