package graft.tables

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Model-based property run for the column-mapping machinery: a random
  * sequence of appends / evolve-appends / renames / drops / re-adds /
  * compactions against a LakeTable must read back EXACTLY what a
  * driver-side model of logical-schema semantics predicts — renamed
  * columns keep their data, dropped columns never resurface (not under
  * ALTER re-add, not under evolve re-add, not after plain or clustered
  * compaction), and rows never gain or lose values through any write
  * path. The name pool is deliberately tiny (a..d) so rename/drop/
  * re-add collisions — the {c→a, a→a__gN} mappings that broke the
  * sequential-rename fold — occur constantly.
  */
class ColumnMappingPropertySpec extends SparkSpec {

  private def forAllSeeded[A](gen: Gen[A], runs: Int)(body: A => Unit): Unit =
    (1 to runs).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  // op space: (code, nameIdx) — interpretation degrades invalid picks
  // to cheap no-ops, so every generated sequence is runnable
  private val pool = Vector("a", "b", "c", "d")
  private val opGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(
      7,
      Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, pool.size - 1)))

  test("random alter/append/compact sequences read back exactly the logical model") {
    forAllSeeded(opGen, 8) { ops =>
      val t = LakeTable(spark, scratchDir("cmprop"))
      // model: live logical value columns + per-row logical values
      var live = Vector("a") // value columns besides the anchor k
      val rows = scala.collection.mutable.ListBuffer.empty[Map[String, String]]
      var nextK = 0

      def appendRows(n: Int, extra: Option[String]): Unit = {
        val cols = live ++ extra.filterNot(live.contains)
        extra.filterNot(live.contains).foreach(e => live = live :+ e)
        val newRows = (1 to n).map { _ =>
          nextK += 1
          cols.map(c => c -> s"${c}_$nextK").toMap + ("k" -> nextK.toString)
        }
        rows ++= newRows
        val schema = org.apache.spark.sql.types.StructType(
          StructField("k", StringType) +: cols.map(c => StructField(c, StringType)))
        val data = newRows.map(r =>
          org.apache.spark.sql.Row.fromSeq(("k" +: cols).map(r(_)))).toList
        t.append(spark.createDataFrame(
          spark.sparkContext.parallelize(data, 1), schema))
      }

      appendRows(2, None) // seed the table so alters have a manifest
      ops.foreach { case (code, ni) =>
        val name = pool(ni)
        code match {
          case 0 => appendRows(2, None)
          case 1 => // evolve-append introducing `name` (may be a re-add)
            if (live.contains(name)) appendRows(1, None)
            else appendRows(1, Some(name))
          case 2 => // rename a live column to `name`
            if (live.contains(name) || live.isEmpty) appendRows(1, None)
            else {
              val from = live(ni % live.size)
              t.alterRenameColumn(from, name)
              live = live.updated(live.indexOf(from), name)
              rows.mapInPlace(r =>
                r.get(from).fold(r - from)(v => r - from + (name -> v)))
            }
          case 3 => // drop a live column (keep at least one)
            if (live.size <= 1) appendRows(1, None)
            else {
              val victim = live(ni % live.size)
              t.alterDropColumn(victim)
              live = live.filterNot(_ == victim)
              rows.mapInPlace(_ - victim) // dropped data must never resurface
            }
          case 4 => // ALTER ADD COLUMNS re-introducing `name`
            if (live.contains(name)) appendRows(1, None)
            else {
              t.alterAddColumns(Seq(StructField(name, StringType)))
              live = live :+ name
            }
          case 5 => // rewrite paths must preserve the logical view
            if (nextK % 2 == 0) t.compact()
            else t.compactClusteredBy(col("k"), Seq.empty, numFiles = 2)
        }
      }

      val expected = rows.map(r =>
        ("k" +: live).map(c => r.getOrElse(c, null)).mkString("|")).toSeq.sorted
      val gotCols = t.read().columns.toSeq
      assert(gotCols == ("k" +: live).toSeq, s"schema drift: $gotCols vs k,$live")
      val got = t.read().collect()
        .map(r => gotCols.indices.map(i =>
          if (r.isNullAt(i)) null else r.getString(i)).mkString("|"))
        .toSeq.sorted
      assert(got == expected,
        s"ops=$ops\nexpected=\n${expected.mkString("\n")}\ngot=\n${got.mkString("\n")}")
    }
  }
}
