package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property run for transform-pruned range reads: whatever subdirs the
  * days()/months() cover math decides to skip, `readBetween` must
  * return EXACTLY the rows a full-scan filter returns — pruning is an
  * optimization, never a semantics change. Random timestamps straddle
  * month boundaries and include NULLs (the Hive default dir); random
  * bounds include one-sided and empty ranges.
  */
class PartitionPrunePropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], runs: Int)(body: A => Unit): Unit =
    (1 to runs).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  // epoch seconds across Dec 2023 – Feb 2024 (month + year boundaries)
  private val t0 = Timestamp.valueOf("2023-12-25 00:00:00").getTime / 1000
  private val t1 = Timestamp.valueOf("2024-02-05 00:00:00").getTime / 1000

  private val caseGen: Gen[(List[Option[Long]], Option[Long], Option[Long], Boolean)] =
    for {
      rows <- Gen.listOfN(30, Gen.frequency(
        9 -> Gen.chooseNum(t0, t1).map(Some(_)),
        1 -> Gen.const(None))) // NULL ts → Hive default dir
      lo <- Gen.option(Gen.chooseNum(t0, t1))
      hi <- Gen.option(Gen.chooseNum(t0, t1))
      months <- Gen.oneOf(true, false)
    } yield (rows, lo, hi, months)

  test("days()/months() range reads equal a full-scan filter on random data and bounds") {
    forAllSeeded(caseGen, 10) { case (rows, lo, hi, months) =>
      val t = LakeTable(spark, scratchDir("ppprop"))
      val df = rows.zipWithIndex.map { case (sec, i) =>
        (i, sec.map(s => new Timestamp(s * 1000L)).orNull)
      }.toDF("id", "ts")
      val spec = if (months) "months(ts)" else "days(ts)"
      // two commits so multiple dirs exist (each with its own subdir set)
      t.append(df.filter(col("id") % 2 === 0), partitionBy = Seq(spec))
      t.append(df.filter(col("id") % 2 =!= 0))
      val loTs = lo.map(s => new Timestamp(s * 1000L))
      val hiTs = hi.map(s => new Timestamp(s * 1000L))
      val got = t.readBetween("ts", loTs, hiTs)
        .collect().map(_.getInt(0)).sorted.toSeq
      val full = t.read()
      val expected = hiTs.foldLeft(
          loTs.foldLeft(full)((d, b) => d.filter(col("ts") >= lit(b))))(
          (d, b) => d.filter(col("ts") <= lit(b)))
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(got == expected,
        s"spec=$spec lo=$loTs hi=$hiTs\nexpected=$expected\ngot=$got")
    }
  }
}
