package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiler — the `ANALYZE TABLE`-shaped statistics pass every
  * lakehouse runs before query planning and data-quality triage: one
  * row per column with row/null/distinct counts, numeric min/max and
  * mean string length.
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * per-column statistic simultaneously (the exact-distinct aggregates
  * share a single Expand-based shuffle — the standard
  * multi-count-distinct plan; at 100 TB swap `countDistinct` for
  * `approx_count_distinct` and the pass becomes a plain one-shuffle
  * hash agg). The per-column pivot happens AFTER aggregation, on the
  * single 1-row result — explode over a literal array, zero extra
  * passes over the data.
  *
  * Determinism: numeric min/max surface as the exact double (or epoch
  * second for timestamps); mean lengths are `sum(length)/count` where
  * the integer sum is exact in a double — no float-summation order
  * sensitivity anywhere.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq

    def isNumeric(t: DataType): Boolean = t match {
      case _: NumericType => true
      case _ => false
    }
    // backtick-quote every source-column reference: a column literally
    // named "user.name" must not parse as nested-field access
    def src(name: String) = col(s"`$name`")

    val aggs = count(lit(1)).as("__n") +: cols.flatMap { f =>
      val c = src(f.name)
      // MapType is not distinct-aggregatable in Spark; profile it as
      // unknown (NULL) rather than failing the whole table
      val nd = f.dataType match {
        case _: MapType => lit(null).cast("long").as(s"__nd_${f.name}")
        case _ => countDistinct(c).as(s"__nd_${f.name}")
      }
      val base = Seq(count(c).as(s"__cnt_${f.name}"), nd)
      val minMax = f.dataType match {
        case t if isNumeric(t) =>
          Seq(
            min(c).cast("double").as(s"__min_${f.name}"),
            max(c).cast("double").as(s"__max_${f.name}"))
        case _: TimestampType | _: TimestampNTZType =>
          // epoch seconds (UTC session): the cross-engine numeric view
          // of a timestamp; unix_timestamp is ANSI-safe where a direct
          // timestamp->long cast is not
          Seq(
            unix_timestamp(min(c).cast("timestamp")).cast("double").as(s"__min_${f.name}"),
            unix_timestamp(max(c).cast("timestamp")).cast("double").as(s"__max_${f.name}"))
        case _ =>
          Seq(
            lit(null).cast("double").as(s"__min_${f.name}"),
            lit(null).cast("double").as(s"__max_${f.name}"))
      }
      val len = f.dataType match {
        case _: StringType =>
          Seq(sum(length(c).cast("long")).as(s"__len_${f.name}"))
        case _ =>
          Seq(lit(null).cast("long").as(s"__len_${f.name}"))
      }
      base ++ minMax ++ len
    }

    val one = df.agg(aggs.head, aggs.tail: _*)

    val rows = cols.map { f =>
      // the generated aliases inherit any dots in the source name —
      // quote them on the way back out too
      def g(prefix: String) = col(s"`__${prefix}_${f.name}`")
      struct(
        lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - g("cnt")).as("n_nulls"),
        g("nd").as("n_distinct"),
        g("min").as("min_num"),
        g("max").as("max_num"),
        when(
          g("cnt") > 0 && g("len").isNotNull,
          round(g("len").cast("double") / g("cnt"), 4))
          .as("avg_len"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
