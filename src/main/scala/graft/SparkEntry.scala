package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.CoreQueries.aggPricingSummary(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    _root_.graft.queries.CoreQueries.queries ++
      _root_.graft.queries.StreamQueries.queries ++
      _root_.graft.queries.ExtQueries.queries ++
      _root_.graft.queries.PipelineQueries.queries ++
      _root_.graft.queries.ScaleQueries.queries ++
      _root_.graft.queries.AnalyticsQueries.queries
  /** Brute-force O(N²) baselines whose ROLE is small-SF oracle
    * cross-checking of a bucketed variant (the LSH twin hash-matches the
    * same oracle): correctness-gated at sf0.01 like every query, but
    * excluded from large-SF benchmarking — a quadratic self-join is not
    * a plan this library endorses at scale, so timing it at sf0.1+
    * would grade a path no user should run there. */
  val oracleOnlyAtScale: Set[String] = Set("q_dedup_embedding")
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    _root_.graft.queries.CoreQueries.oracleSql ++
      _root_.graft.queries.StreamQueries.oracleSql ++
      _root_.graft.queries.ExtQueries.oracleSql ++
      _root_.graft.queries.PipelineQueries.oracleSql ++
      _root_.graft.queries.ScaleQueries.oracleSql ++
      _root_.graft.queries.AnalyticsQueries.oracleSql
}
