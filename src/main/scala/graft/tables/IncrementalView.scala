package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate view — the gold-layer
  * pattern the reference rebuilds by re-running its whole silver→gold DAG
  * (/root/reference/src/gold/dim_fact_tables.py re-reads the silver
  * tables every run): keyed counts and sums over a source [[LakeTable]],
  * refreshed by reading ONLY the commit dirs added since the last
  * refresh and merging them additively into the stored state.
  *
  * State invariants that make the merge exact at any scale:
  *   - counts are `long`, sums are integer-scaled (×10⁴) `decimal(38,0)`
  *     — addition is associative and order-independent, so
  *     refresh-in-N-steps is bit-identical to one full recompute (the
  *     same rule every cross-engine float mean in this repo follows; a
  *     running `avg(double)` would drift with refresh batching)
  *   - the delta comes from [[LakeTable.readAddedSince]], which only
  *     certifies strictly-additive history; any overwrite/merge/replace
  *     in the source (or an expired baseline manifest) degrades to a
  *     full recompute — never a wrong answer
  *
  * Refresh cost: O(new data) to aggregate + O(|view|) to rewrite the
  * state table. |view| = number of groups (gold-layer cardinality), so
  * the rewrite is the cheap half; at extreme group cardinality the
  * overwrite could become a keyed partition-scoped merge, same as any
  * SCD1 target.
  */
final class IncrementalAggView(
    val view: LakeTable,
    source: LakeTable,
    keyCols: Seq[String],
    sumCols: Seq[String],
    minMaxCols: Seq[String] = Seq.empty) {

  private val metaPath = Paths.get(view.root, "_view_meta.json")

  private def stateCol(c: String): String = s"s_${c}_e4"

  /** Source manifest version the state currently reflects. */
  def refreshedThrough(): Option[Long] =
    if (!Files.exists(metaPath)) None
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8))
      Some(node.get("sourceVersion").asLong())
    }

  private def writeMeta(sourceVersion: Long): Unit = {
    Files.createDirectories(metaPath.getParent)
    val tmp = metaPath.getParent.resolve(s".tmp-meta-${UUID.randomUUID()}.json")
    Files.write(tmp, s"""{"sourceVersion":$sourceVersion}""".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaPath, StandardCopyOption.ATOMIC_MOVE)
  }

  /** One hash aggregation to additive partial state. min/max ride along:
    * under append-only history they are associative-commutative folds, so
    * batched refresh equals full recompute exactly (no subtraction ever
    * needed — deletes force the full-recompute path anyway).
    */
  private def partial(df: DataFrame): DataFrame = {
    // refuse up front what the state expression cannot hold exactly: the
    // ×10⁴ product is typed decimal(38,4) (34 integer digits), so a
    // decimal(p,s) with p-s > 30 can make |x·10⁴| ≥ 10³⁴ overflow the
    // product (ANSI throw / silent null), turning refresh into a
    // data-dependent failure. Fail loudly at refresh instead.
    sumCols.foreach { c =>
      df.schema(c).dataType match {
        case d: org.apache.spark.sql.types.DecimalType
            if d.precision - d.scale > IncrementalAggView.MaxSumIntDigits =>
          throw new IllegalArgumentException(
            s"sum column `$c` is decimal(${d.precision},${d.scale}); " +
              s"integer digits > ${IncrementalAggView.MaxSumIntDigits} cannot be " +
              "represented in the exact x10^4 view state — drop the column " +
              "or reduce precision")
        case _ => ()
      }
    }
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        // scale in DECIMAL, never the column's native type: `intCol *
        // 10000` would wrap int at |v| > 214,748 (or throw under ANSI).
        // cast(x as decimal(38,4)) rounds half-up at 4 fraction digits —
        // the same value round(x * 10000) produced — and the product is
        // typed decimal(38,4) again, which holds |x·10⁴| < 10³⁴ exactly;
        // the MaxSumIntDigits guard above (|x| < 10³⁰) is what makes
        // that bound unconditional.
        sumCols.map(c =>
          sum(expr(s"cast(cast(`$c` as decimal(38,4)) * 10000 as decimal(38,0))"))
            .as(stateCol(c))) ++
          minMaxCols.flatMap(c =>
            Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
  }

  /** Bring the view up to the source's current snapshot. Reads only the
    * commits added since the last refresh when the history is provably
    * additive; otherwise recomputes from the full source. Returns the
    * source version the state now reflects.
    */
  def refresh(): Long = {
    val last = refreshedThrough()
    val (cur, deltaOpt) = source.readAddedSince(last)
    if (last.contains(cur)) return cur // already current: zero work
    val next = deltaOpt match {
      case Some(delta) =>
        val d = partial(delta)
        val prev = view.read()
        // additive full-outer merge on the group keys: groups only ever
        // gain mass, so coalesce-to-zero plus decimal addition is exact
        val merged = prev
          .join(d.select(d.columns.map(c => col(c).as(s"__d_$c")): _*),
            // null-safe: a NULL group key is still one group, not a
            // never-matching pair of rows on either side of the merge
            keyCols.map(k => prev(k) <=> col(s"__d_$k")).reduce(_ && _),
            "full_outer")
          .select(
            keyCols.map(k => coalesce(prev(k), col(s"__d_$k")).as(k)) ++
              Seq((coalesce(prev("n_rows"), lit(0L)) +
                coalesce(col("__d_n_rows"), lit(0L))).as("n_rows")) ++
              sumCols.map { c =>
                (coalesce(prev(stateCol(c)), lit(0).cast("decimal(38,0)")) +
                  coalesce(col(s"__d_${stateCol(c)}"), lit(0).cast("decimal(38,0)")))
                  .cast("decimal(38,0)").as(stateCol(c))
              } ++
              minMaxCols.flatMap { c =>
                // least/greatest skip NULLs, so a one-sided group keeps
                // its side's value
                Seq(
                  least(prev(s"min_$c"), col(s"__d_min_$c")).as(s"min_$c"),
                  greatest(prev(s"max_$c"), col(s"__d_max_$c")).as(s"max_$c"))
              }: _*)
        merged
      case None => partial(source.read())
    }
    view.overwrite(next)
    writeMeta(cur)
    cur
  }

  /** Current state with derived 4-dp sums alongside the raw counts —
    * `sum_<c>` is the exact integer-scaled sum divided back down.
    */
  def read(): DataFrame = {
    val st = view.read()
    sumCols.foldLeft(st) { (df, c) =>
      df.withColumn(s"sum_$c", round(col(stateCol(c)).cast("double") / 10000.0, 4))
    }
  }
}

object IncrementalAggView {

  /** Widest integer-digit count (precision − scale) a decimal sum column
    * may have and still refresh exactly. The state expression is
    * `cast(cast(c as decimal(38,4)) * 10000 as decimal(38,0))`: Spark
    * types the product decimal(38,4) (34 integer digits), so any |x| ≥
    * 10³⁰ makes |x·10⁴| ≥ 10³⁴ and the PRODUCT overflows — throwing
    * under ANSI, silently NULLing (corrupting the sum) without. 30 is
    * the widest bound the product representation actually holds for;
    * [[graft.plans.MatViews]] keys its sum-routing admissibility off
    * this same constant so no query can route to a state that refused
    * (or corrupted) its refresh.
    */
  val MaxSumIntDigits: Int = 30

  def apply(
      source: LakeTable,
      viewRoot: String,
      keyCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Seq.empty): IncrementalAggView =
    new IncrementalAggView(
      LakeTable(source.spark, viewRoot), source, keyCols, sumCols, minMaxCols)
}
