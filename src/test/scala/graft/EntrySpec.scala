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
    assert(rowsOnly == Set("q_dedup_simhash", "q_approx_distinct"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("oracle-checked queries emit only scalar top-level columns") {
    // The driver's verifier row-sorts result frames through pandas before
    // hashing; array/struct/map cells are unhashable there, so any
    // oracle-checked query emitting one ships with NO correctness signal
    // (r7: q_embedding_centroids). Pin the invariant at the schema level.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val sfDir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.oracleSql.keySet.toSeq.sorted.flatMap { name =>
      val bad = SparkEntry.queries(name)(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      if (bad.isEmpty) Nil else Seq(s"$name(${bad.mkString(",")})")
    }
    assert(offenders.isEmpty,
      s"oracle-checked queries with non-scalar output columns: ${offenders.mkString("; ")}")
  }
}
