package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Scale audit, enforced: the physical plans that matter must keep the
  * shape that survives a 100 TB / 1000-executor scale-up — filters and
  * projections reaching the parquet scan, small dims broadcast (never
  * shuffled), aggregates doing map-side partial combine. A regression
  * here is a performance bug even while results stay correct.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def withAqeOff[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("filter + narrow projection push down to the parquet scan") {
    val p = plan(graft.queries.CoreQueries.filterPushdown(spark, sf))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("l_returnflag"), p)
    // pruned read schema: the scan must not read the unused columns
    assert(!p.split("ReadSchema")(1).split("\n")(0).contains("l_tax"), p)
  }

  test("lake.* SQL predicates cross the V1Scan bridge as pushed filters") {
    // the WHERE on a DSv2-catalog read must be pushed INTO the bridge
    // (applied on LakeTable.read() where parquet row-group stats prune
    // under it), with the untranslatable term left as residual — the
    // one plan shape that survives a 100× scale-up of SQL-path reads
    val p = plan(graft.queries.ScaleQueries.sqlPushdown(spark, sf))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThan(o_totalprice"), p)
    assert(p.contains("EqualTo(o_orderstatus"), p)
  }

  test("star joins broadcast the dims — no shuffle of the fact side") {
    val p = plan(graft.queries.CoreQueries.joinStar(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("iterated snowflake flatten broadcasts every level") {
    val p = plan(graft.queries.CoreQueries.joinSnowflakeIterated(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("group-agg does map-side partial aggregation before the shuffle") {
    val p = plan(graft.queries.CoreQueries.aggPricingSummary(spark, sf))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum") || p.contains("Partial"), p)
  }

  test("incremental watermark scan plans as a literal pushable predicate") {
    val df = graft.queries.CoreQueries.incrementalScan(spark, sf)
    val p = plan(df)
    // the high-watermark comparison must reach the scan as a pushed filter
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"), p)
  }

  test("as-of join plans exactly one shuffle (tagged union + window, no range join)") {
    val p = plan(graft.queries.AnalyticsQueries.asofJoin(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    // one for the union-window pass, one for the candle aggregation it consumes
    assert(exchanges <= 2, s"$exchanges hash exchanges:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("bucketed join reads bucket-to-bucket: no exchange on either join side") {
    val df = graft.queries.ScaleQueries.bucketedJoin(spark, sf)
    val p = plan(df)
    assert(p.contains("SortMergeJoin"), p)
    // the ONLY exchange allowed is the post-join re-aggregation; the join
    // inputs come straight from the bucketed scans
    val exchanges = "\\+- Exchange|:- Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"$exchanges exchanges (want 1, the final agg):\n$p")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"), p)
  }

  test("rank<=k filters plan as WindowGroupLimit — bounded per-key state, not a full sort-rank") {
    // Spark 4's WindowGroupLimit pushes the row_number()<=k filter into a
    // bounded top-k buffer per key (partial before the shuffle, final
    // after) — each task retains k rows per key instead of ranking
    // everything. Our top-k operators are written to trigger it.
    val p = plan(graft.queries.ExtQueries.similarityTopK(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("stratified sample plans as WindowGroupLimit with a single stratum exchange") {
    val p = plan(graft.queries.ExtQueries.sampleStratified(spark, sf))
    // rank<=n must map-side-prune each stratum before the shuffle
    assert(p.contains("WindowGroupLimit"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"$exchanges hash exchanges:\n$p")
  }

  test("embedding quantization is a pure map stage: no exchange at all") {
    val p = plan(graft.queries.ExtQueries.embeddingQuantize(spark, sf))
    assert(!p.contains("Exchange"), p)
  }

  test("bigram LM scoring joins on the gram key without broadcasting the model's big side") {
    val p = plan(graft.queries.ExtQueries.bigramLm(spark, sf))
    // No cartesian shapes. The single permitted BroadcastNestedLoopJoin is
    // the 1-row vocabulary-size attach, and it must sit on the bounded
    // unigram-model side (LanguageModel pre-computes `denom` there), never
    // over the unbounded doc-gram stream.
    assert(!p.contains("CartesianProduct"), p)
    // formatted explain names each node twice (tree + details): 2 hits = 1 node
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 2, p)
  }

  test("brute-force topk broadcasts the query side") {
    val p = plan(graft.queries.ExtQueries.similarityTopK(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("IVF assignment is a pure projection: corpus never shuffles, probes broadcast") {
    // the ONLY hash exchange allowed is the final per-query rank window;
    // nearest-centroid assignment must not repartition the corpus
    val p = plan(graft.queries.ExtQueries.similarityIvf(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"$exchanges hash exchanges (want <=1, the rank window):\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("LSH candidate expansion is join-free: one signature pass, one window") {
    // r12 regression: the bucket SELF-join evaluated the whole
    // shingle+signature pass once per side. The collect_list expansion
    // must keep the candidate stage join-free — the only joins in the
    // full minhash query are the two verification joins of the shingle
    // sets onto the pair set, and the simhash query has none at all.
    val mh = plan(graft.queries.ExtQueries.dedupMinhash(spark, sf))
    val mhJoins = "HashJoin|SortMergeJoin".r.findAllIn(mh).length
    // formatted explain names each node twice (tree + details)
    assert(mhJoins <= 4, s"minhash plans ${mhJoins / 2} joins (want <=2):\n$mh")
    assert("Window".r.findAllIn(mh).length <= 2, s"minhash plans >1 window:\n$mh")
    val sh = plan(graft.queries.ExtQueries.dedupSimhashMd5(spark, sf))
    assert(!sh.contains("Join"), s"simhash should be join-free:\n$sh")
  }

  test("EXISTS/NOT-EXISTS plan as equi-keyed semi/anti joins — never a subquery loop") {
    val semi = plan(graft.queries.CoreQueries.tpchOrderPriority(spark, sf))
    assert(semi.contains("LeftSemi"), semi)
    assert(!semi.contains("BroadcastNestedLoopJoin") && !semi.contains("CartesianProduct"), semi)
    val anti = plan(graft.queries.CoreQueries.tpchWaitingOrders(spark, sf))
    assert(anti.contains("LeftAnti"), anti)
    assert(!anti.contains("BroadcastNestedLoopJoin") && !anti.contains("CartesianProduct"), anti)
    // the anti probe side must carry the pushed returnflag filter
    assert(anti.contains("l_returnflag"), anti)
  }

  test("outer-join histogram keeps the join predicate on the input side, aggs partial") {
    val p = plan(graft.queries.CoreQueries.tpchCustomerDistribution(spark, sf))
    // the o_orderpriority predicate must sit below the outer join (a
    // Filter/scan-pushdown on the orders input), never above it
    assert(p.contains("LeftOuter") || p.contains("RightOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    val joinIdx = p.indexOf("Join")
    val filtIdx = p.indexOf("1-URGENT")
    assert(filtIdx >= 0, p)
  }

  test("scalar-subquery threshold broadcasts one row; NOT EXISTS is LeftAnti") {
    val p = plan(graft.queries.CoreQueries.tpchSalesOpportunity(spark, sf))
    assert(p.contains("LeftAnti"), p)
    // the 1-row average meets the customer stream via broadcast, and the
    // big side is never repartitioned for it
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("decontamination probes eval grams via broadcast — the corpus side never sort-merges") {
    val p = plan(graft.queries.ExtQueries.decontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("bloom-prune probe is a compiled expression, not a ScalaUDF") {
    val p = plan(graft.queries.ScaleQueries.bloomPruneJoin(spark, sf))
    assert(!p.contains("ScalaUDF"), p)
    assert(p.contains("graft_bloom_might_contain") || p.contains("bloommightcontain"),
      s"bloom probe missing from plan:\n$p")
  }

  test("incremental dedup anti-joins the fingerprint index — never a nested loop") {
    val p = plan(graft.queries.ExtQueries.dedupIncremental(spark, sf))
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("quality threshold broadcasts the per-source cutoffs to the row stream") {
    val p = plan(graft.queries.ExtQueries.qualityThreshold(spark, sf))
    // the row-stream side must meet the (tiny) cutoff table via broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    // the only window runs over the per-(source, score) histogram
    val windows = "Window".r.findAllIn(p).length
    assert(windows >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bm25 plans a per-partition top-k and broadcasts df + corpus stats") {
    val p = plan(graft.queries.ExtQueries.bm25Search(spark, sf))
    // final top-k: TakeOrderedAndProject, never a global Sort+Limit
    assert(p.contains("TakeOrderedAndProject"), p)
    // document frequencies (|Q| rows) and the 1-row stats scalar reach
    // the scoring side via broadcast, not shuffle
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("Q3 shape: date filters reach both scans, customer dim broadcasts") {
    val p = plan(graft.queries.CoreQueries.tpchShippingPriority(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters"), p)
    // both opposing date predicates must be pushed, not evaluated post-scan
    assert(p.contains("LessThan(o_orderdate"), p)
    assert(p.contains("GreaterThan(l_shipdate"), p)
    // top-10 must be a bounded TakeOrdered, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("Q5 shape: 6-way join keeps region/nation broadcast and the date range pushed") {
    val p = plan(graft.queries.CoreQueries.tpchLocalVolume(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
    assert(p.contains("LessThan(o_orderdate"), p)
  }

  test("Q10 shape: returnflag filter reaches the fact scan, top-20 plans bounded") {
    val p = plan(graft.queries.CoreQueries.tpchReturnedItems(spark, sf))
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("Q2 shape: every join broadcasts — the offer agg input is semi-pruned, never sort-merged") {
    val p = plan(graft.queries.CoreQueries.tpchMinCostSupplier(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // part filter pushes to the part scan, not evaluated post-read
    assert(p.contains("EqualTo(p_size,15)"), p)
  }

  test("Q7 shape: both facts pre-shrink via broadcast before the orderkey shuffle") {
    val p = plan(graft.queries.CoreQueries.tpchVolumeShipping(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    // the two-year ship window must reach the lineitem scan
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("LessThan(l_shipdate"), p)
  }

  test("Q17 shape: brand filter pushes; the avg join is AQE-chosen, never a nested loop") {
    // The per-part average join carries NO explicit broadcast hint: a
    // per-part aggregate is not dimension-sized at scale (one brand is
    // ~10^8 parts at SF100k), so the strategy is left to AQE — broadcast
    // when the runtime slice is small, shuffle when it isn't. The pins
    // here are the scale-invariants: pushed brand filter, equi-keyed join
    // shapes only, and the semi-prune of lineitem staying broadcast.
    val p = plan(graft.queries.CoreQueries.tpchSmallQtyRevenue(spark, sf))
    assert(p.contains("EqualTo(p_brand,Brand#12)"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("semantic dedup: ONE corpus scan + argmax feeds both self-join sides via exchange reuse") {
    // r13 perf finding: the assignment projection (corpus scan + k-cosine
    // argmax) was evaluated once per join side. The self-join now aliases
    // a single assignment frame, so both sides canonicalize to the same
    // cluster-keyed exchange and Spark plans a ReusedExchange — the
    // heaviest stage runs once. Regression here doubles the dominant cost.
    // AQE's explain defers reuse to stage materialization (its stage cache
    // keys on the same plan canonicalization), so pin the property with
    // the static planner, where ReuseExchangeAndSubquery makes it visible.
    val p = withAqeOff(plan(graft.queries.ExtQueries.dedupSemantic(spark, sf)))
    assert(p.contains("ReusedExchange"), s"both join sides rescan the corpus:\n$p")
    assert(p.contains("SortMergeJoin"), s"corpus-sized side must never broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("Q19 shape: hoisted conjuncts of the disjunction push to both scans") {
    val p = plan(graft.queries.CoreQueries.tpchDisjunctiveRevenue(spark, sf))
    // quantity range (the OR arms' common envelope) reaches lineitem...
    assert(p.contains("GreaterThanOrEqual(l_quantity,1"), p)
    assert(p.contains("LessThanOrEqual(l_quantity,30"), p)
    // ...and the brand IN-list reaches the part scan
    assert(p.contains("In(p_brand"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("bloom point lookup pushes the IN-probe to the scan") {
    val p = plan(graft.queries.ScaleQueries.bloomPointLookup(spark, sf))
    assert(p.contains("In(o_orderkey"), p)
  }

  test("partitioned fact scan carries a dynamicpruning partition filter from the dim") {
    // q_dpp_join: the run-time-only dim filter must inject a DPP
    // subquery into the fact scan's PartitionFilters — whole day
    // partitions skip before a single row is read. Without this the
    // join degrades to a full fact scan at any scale.
    val p = plan(graft.queries.ScaleQueries.dppJoin(spark, sf))
    assert(p.contains("dynamicpruning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pq encode is a pure projection: no exchange at all") {
    val e = graft.sources.Testdata.read(spark, sf, "embeddings")
    val books = graft.ext.ProductQuant.pqFit(e, "vec_id", "embedding", 4, 8, 1)
    val p = plan(graft.ext.ProductQuant.pqEncode(e, "vec_id", "embedding", books, 8))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("adc probe reads only the (id, code) columns — never the embedding") {
    val e = graft.sources.Testdata.read(spark, sf, "embeddings")
    val books = graft.ext.ProductQuant.pqFit(e, "vec_id", "embedding", 4, 8, 1)
    val enc = graft.ext.ProductQuant
      .pqEncode(e, "vec_id", "embedding", books, 8)
    // materialize the encoded table the way a real index would be stored,
    // then audit the probe-side scan schema
    val dir = graft.util.TempDirs.scratch("pq-audit")
    enc.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val q = Seq((0L, (0 until 64).map(_.toDouble).toSeq))
    val p = plan(graft.ext.ProductQuant.adcTopK(stored, "vec_id", books, 8, q, 5))
    val read = p.split("ReadSchema")(1).split("\n")(0)
    assert(!read.contains("embedding"), s"probe must not read vectors: $read")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("adc probe over a list_id-partitioned index scans only the probed partitions") {
    val e = graft.sources.Testdata.read(spark, sf, "embeddings")
    val books = graft.ext.ProductQuant.pqFit(e, "vec_id", "embedding", 4, 8, 1)
    val enc = graft.ext.ProductQuant
      .pqEncode(e, "vec_id", "embedding", books, 8)
      // store the index the way the 100 TB deployment would: partitioned
      // by inverted list, so a probe's isin filter prunes whole partitions
      .withColumn("list_id", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("code"), org.apache.spark.sql.functions.lit(4)))
    val dir = graft.util.TempDirs.scratch("pq-part-audit")
    enc.write.partitionBy("list_id").mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val probed = stored.filter(org.apache.spark.sql.functions.col("list_id").isin(0, 1))
    val p = plan(probed)
    // the isin lands in PartitionFilters: non-probed lists are never read
    assert(p.contains("PartitionFilters"), p)
    val pf = p.split("PartitionFilters")(1).split("\n")(0)
    assert(pf.contains("list_id"), s"probe filter must prune partitions: $pf")
  }

  test("ivf-pq search never shuffles the corpus") {
    val e = graft.sources.Testdata.read(spark, sf, "embeddings")
    val q = Seq((0L, (0 until 64).map(_.toDouble / 64).toSeq))
    val p = plan(graft.ext.ProductQuant.ivfAdcTopK(
      e, "vec_id", "embedding", nlist = 4, m = 4, k = 8, nprobe = 2,
      queries = q, topK = 5))
    // assign + residual-encode + probe are all projections/filters over
    // literal codebooks; the only "wide" op is the per-query top-k
    assert(!p.contains("Exchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("pagerank iterations are hash joins + partial aggs — no cartesian, no window") {
    val p = plan(graft.queries.AnalyticsQueries.pagerankPurchases(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the per-round in-mass sum must combine map-side
    assert(p.contains("partial_sum") || p.contains("Partial"), p)
    // no whole-graph window funnel
    assert(!p.contains("Window"), p)
  }

  test("hybrid RRF legs both end in driver-bounded top-k") {
    val p = plan(graft.queries.ExtQueries.hybridSearchRrf(spark, sf))
    // two TakeOrderedAndProject nodes: the lexical and vector top-20 cuts
    assert(p.split("TakeOrderedAndProject").length >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("regression fit is one corpus aggregation then scalar algebra") {
    val p = plan(graft.queries.ExtQueries.regressionFit(spark, sf))
    // one table, one aggregation: no join anywhere, and the only
    // exchange is the single aggregate's partial->final boundary
    assert(!p.contains("Join"), p)
    assert(p.split("\\(\\d+\\) Exchange").length == 2, s"expected exactly one exchange:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("skew profile is two-level hash aggregation with map-side combine") {
    val p = plan(graft.queries.ExtQueries.skewProfile(spark, sf))
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("truncated retrieval and hard negatives broadcast the anchor side") {
    for (df <- Seq(
        graft.queries.ExtQueries.similarityTruncated(spark, sf),
        graft.queries.ExtQueries.hardNegatives(spark, sf))) {
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
      assert(!p.contains("ScalaUDF"), p)
    }
  }

  test("funnel and ewma fold in-row: no window, no join, one keyed aggregation") {
    for (df <- Seq(
        graft.queries.AnalyticsQueries.funnel(spark, sf),
        graft.queries.AnalyticsQueries.ewmaDecay(spark, sf))) {
      val p = plan(df)
      // the sequential logic lives in the collected-array fold — the
      // plan must NOT contain a per-user window or an events self-join
      assert(!p.contains("Window"), p)
      assert(!p.contains("Join"), p)
      assert(!p.contains("ScalaUDF"), p)
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    }
  }

  test("heavy hitters shuffles bounded sketches, not the term universe") {
    val p = plan(graft.queries.AnalyticsQueries.heavyHitters(spark, sf))
    // partial MisraGries before the exchange: the shuffle carries one
    // <=k-counter summary per (lang, partition), never per-term rows
    assert(p.contains("graft_mg") || p.contains("misragries") || p.contains("MisraGries"),
      s"native aggregate missing from plan:\n$p")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("curriculum sample is a map-only projection after the boundary collect") {
    val p = plan(graft.queries.ExtQueries.curriculumSample(spark, sf))
    // boundaries are plan literals: no window (a global ntile would
    // funnel the corpus through one task), no join, no exchange at all
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("persisted IVF probe: broadcast probes dynamically prune index partitions") {
    val p = plan(graft.queries.ExtQueries.similarityIvfPersisted(spark, sf))
    // the postings scan must carry a dynamicpruning partition filter on
    // list_id — a probe reads only its lists' files from the persisted
    // index, never the whole postings table
    assert(p.contains("dynamicpruning"), s"expected DPP on the postings scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("event transitions: keyed window then partial-agg; totals broadcast back") {
    val p = plan(graft.queries.AnalyticsQueries.eventTransitions(spark, sf))
    assert(p.contains("Window"), p) // keyed by user — the scalable kind
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("deletes fuzzy join verifies string CLASSES — no output-sized distinct") {
    val p = plan(graft.queries.ExtQueries.fuzzyJoinDeletes(spark, sf))
    // the verify must run once per distinct string pair; if the plan
    // regresses to key level, the pair-dedup reappears as an aggregate
    // keyed on the OUTPUT columns (multiplicity²-sized at scale)
    assert(p.contains("levenshtein"), p)
    assert(!p.contains("keys=[probe_key"), s"output-sized distinct is back:\n$p")
    // deletion keys join as longs, never as the raw variant strings
    assert(p.contains("xxhash64"), p)
  }

  test("triangle intersect joins BROADCAST at oracle scale — the shuffle-hash hint stays inside") {
    val p = plan(graft.queries.AnalyticsQueries.triangleCount(spark, sf))
    // both adjacency gates hold at sf0.001, so eSized(broadcast) must be
    // the OUTERMOST hint: on merge the outer strategy hint wins, and the
    // r19 nesting (hint outside broadcast) silently flipped both
    // intersect joins to ShuffledHashJoin, re-shuffling the oriented
    // edge list twice (ADVICE r19)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), s"shuffle_hash hint overrode broadcast:\n$p")
  }

  test("prefix fuzzy join verifies string CLASSES — verify below the expansion joins") {
    val p = plan(graft.queries.ExtQueries.fuzzyJoin(spark, sf))
    assert(p.contains("levenshtein"), p)
    assert(!p.contains("keys=[probe_key"), s"output-sized re-aggregation is back:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }
}
