package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Delta Live Tables
  * `expect` / `expect_or_drop` / `expect_or_fail` contract; the
  * reference enforces the same idea imperatively with dropna/filter
  * chains in its silver jobs, /root/reference/src/silver/silver_load_
  * ohlcv.py). Each expectation is a named boolean predicate over the
  * row; actions:
  *
  *   - [[Expectations.Warn]]: keep the row, count the violation
  *   - [[Expectations.Drop]]: quarantine the row
  *   - [[Expectations.Fail]]: abort the batch if ANY row violates
  *
  * Scale shape: one projection computes every predicate once
  * (codegen'd column algebra — no UDFs), the kept/quarantined split is
  * two filters over it, and the fail-gate is a single short-circuit
  * aggregation. Nothing here shuffles; violation counts ride a single
  * hash agg over the violation bitmap.
  */
object Expectations {
  sealed trait Action
  case object Warn extends Action
  case object Drop extends Action
  case object Fail extends Action

  final case class Expectation(name: String, condition: Column, action: Action = Drop)

  final case class CheckResult(
      kept: DataFrame,
      quarantined: DataFrame, // original rows + `_violations: array<string>`
      violationCounts: Map[String, Long])

  private def flagCol(e: Expectation): String = s"__exp_${e.name}"

  /** Evaluate `expectations` over `df`. NULL predicate results count as
    * violations (a null-valued CHECK is not a pass — same stance as SQL
    * constraint semantics under `NOT (x)` filters being false for NULL).
    */
  def check(df: DataFrame, expectations: Seq[Expectation]): CheckResult = {
    require(expectations.nonEmpty, "no expectations given")
    require(
      expectations.map(_.name).distinct.size == expectations.size,
      "expectation names must be unique")
    val flagged = df.select(
      df.columns.map(col(_)) ++
        expectations.map(e => coalesce(e.condition, lit(false)).as(flagCol(e))): _*)

    // ONE aggregation yields every violation count; the fail gate reads
    // it rather than running a second scan
    val countRow = flagged.agg(
      sum(when(!col(flagCol(expectations.head)), 1L).otherwise(0L)),
      expectations.tail.map(e => sum(when(!col(flagCol(e)), 1L).otherwise(0L))): _*).head()
    val counts = expectations.zipWithIndex.map { case (e, i) =>
      e.name -> (if (countRow.isNullAt(i)) 0L else countRow.getLong(i))
    }.toMap

    val failed = expectations.filter(e => e.action == Fail && counts(e.name) > 0)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"expectation(s) failed on batch: ${failed.map(_.name).mkString(", ")}")

    val dropping = expectations.filter(_.action == Drop)
    val keepCond = dropping
      .map(e => col(flagCol(e)))
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    val violArray = array_compact(array(expectations.map(e =>
      when(!col(flagCol(e)), lit(e.name))): _*))
    val flagNames = expectations.map(flagCol)
    val kept = flagged.filter(keepCond).drop(flagNames: _*)
    val quarantined = flagged
      .filter(!keepCond)
      .withColumn("_violations", violArray)
      .drop(flagNames: _*)
    CheckResult(kept, quarantined, counts)
  }
}
