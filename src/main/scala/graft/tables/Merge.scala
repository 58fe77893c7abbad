package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO rewrites: SCD Type 1 (upsert) and SCD Type 2
  * (close-then-insert versioning), with the exact observable semantics of
  * the reference's two-pass Iceberg MERGEs
  * (/root/reference/src/silver/_silver_utils.py:108-186), expressed as
  * join + union plans committed atomically through [[LakeTable]].
  *
  * Spark 4 only parses `MERGE INTO` against a DSv2 table that implements
  * row-level operations; with no Iceberg/Delta jars in the environment the
  * idiomatic route is exactly this read-modify-write plan — which is also
  * what those engines execute under the hood (a join between target and
  * source, then a rewrite of matched files).
  *
  * Scale note: both merges broadcast nothing by default — the target and
  * source shuffle-hash-join on the key columns, so the plan scales with
  * partition count. The rewrite commits the whole table, which is correct
  * for dimension-sized targets (the reference's use case: ≈30-row company
  * dim). A 100 TB fact-table merge would instead rewrite only affected
  * partitions: pair this with partition pruning by restricting the
  * rewrite to `touchedPartitions` when the target is partitioned.
  */
object Merge {

  private val StartCol = "start_timestamp"
  private val EndCol = "end_timestamp"
  private val CurrentCol = "is_current"

  /** Stamp SCD2 bookkeeping columns onto a source batch
    * (reference `_add_scd2_cols`, _silver_utils.py:108-113).
    */
  def addScd2Cols(df: DataFrame, at: Timestamp): DataFrame =
    df.withColumn(StartCol, lit(at))
      .withColumn(EndCol, lit(null).cast("timestamp"))
      .withColumn(CurrentCol, lit(1))

  /** SCD Type 2 merge. Reference semantics (SURVEY §2.4) preserved:
    *   - brand-new key → insert one open version;
    *   - existing key, any tracked column differs (null-safely) → the
    *     open target version is closed (`end_timestamp = at`,
    *     `is_current = 0`) and one new open version is inserted;
    *   - existing key, tracked columns identical → source row silently
    *     skipped (no duplicate version);
    *   - historical (`is_current = 0`) rows are never touched.
    *
    * `at` is the merge instant (the reference uses CURRENT_TIMESTAMP();
    * deterministic tests pass a fixed clock).
    */
  def mergeScd2(
      table: LakeTable,
      source: DataFrame,
      keyCols: Seq[String],
      trackedCols: Seq[String],
      at: Timestamp): Long = {
    val stamped = addScd2Cols(source, at)
    if (!table.exists || table.isEmpty) return table.append(stamped)

    val target = table.read()
    val dataCols = target.columns.toSeq // includes scd2 bookkeeping cols

    val src = stamped.select(dataCols.map(col): _*).alias("s")
    val tgt = target.alias("t")

    val keyEq: Column = keyCols
      .map(k => col(s"t.$k") === col(s"s.$k"))
      .reduce(_ && _)
    val anyTrackedDiffers: Column = trackedCols
      .map(c => !(col(s"t.$c") <=> col(s"s.$c")))
      .reduce(_ || _)

    // Close pass: current target rows whose source counterpart changed.
    val joined = tgt.join(src, keyEq && col(s"t.$CurrentCol") === 1, "left")
    val sourceMatched = col(s"s.${keyCols.head}").isNotNull
    val mustClose = sourceMatched && anyTrackedDiffers
    val rewrittenTarget = joined.select(
      dataCols.map {
        case EndCol => when(mustClose, lit(at)).otherwise(col(s"t.$EndCol")).as(EndCol)
        case CurrentCol => when(mustClose, lit(0)).otherwise(col(s"t.$CurrentCol")).as(CurrentCol)
        case c => col(s"t.$c").as(c)
      }: _*)

    // Insert pass: source rows with no *current, tracked-identical* match
    // (i.e. new keys or changed values) get a fresh open version.
    val currentTgt = target.filter(col(CurrentCol) === 1).alias("t")
    val inserts = src
      .join(
        currentTgt,
        keyCols.map(k => col(s"s.$k") === col(s"t.$k")).reduce(_ && _) &&
          trackedCols.map(c => col(s"s.$c") <=> col(s"t.$c")).reduce(_ && _),
        "left_anti")
      .select(dataCols.map(c => col(s"s.$c").as(c)): _*)

    table.overwrite(rewrittenTarget.unionByName(inserts))
  }

  /** SCD Type 1 merge: upsert — matched keys take all source columns,
    * unmatched target rows survive, unmatched source rows insert
    * (reference merge_scd1, _silver_utils.py:157-186).
    */
  def mergeScd1(table: LakeTable, source: DataFrame, keyCols: Seq[String]): Long = {
    if (!table.exists || table.isEmpty) return table.append(source)
    val target = table.read()
    val dataCols = target.columns.toSeq
    val src = source.select(dataCols.map(col): _*)
    val survivors = target.join(src.select(keyCols.map(col): _*), keyCols, "left_anti")
    table.overwrite(survivors.unionByName(src))
  }
}
