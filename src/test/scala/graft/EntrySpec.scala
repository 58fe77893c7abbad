package graft

/** The driver's smoke contract: entry() runs on sf0.001 and returns rows,
  * and every queries key has either an oracle or a documented rows-only
  * status.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query; rows-only set is the documented one") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o -- q}")
    val rowsOnly = q -- o
    // genuinely non-replicable operators only (HLL sketch, xxhash64-seeded
    // probabilistic structures) — everything else must be oracle-checked
    assert(rowsOnly == Set(
      "q_dedup_simhash", "q_similarity_ann", "q_similarity_ivf", "q_approx_distinct"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
