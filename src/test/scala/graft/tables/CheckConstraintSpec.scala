package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Table-level CHECK constraints: validated against existing data at
  * add time, enforced on every later write path, survive unrelated
  * commits, droppable.
  */
class CheckConstraintSpec extends SparkSpec {
  import spark.implicits._

  test("add validates existing data; later appends/overwrites/updates enforce") {
    val t = LakeTable(spark, scratchDir("check"))
    t.append(Seq((1, 10.0), (2, 20.0)).toDF("id", "v"))
    t.addCheckConstraint("v_pos", "v > 0")
    assert(t.checkConstraints() == Map("v_pos" -> "v > 0"))

    // clean append passes and the constraint survives the commit
    t.append(Seq((3, 30.0)).toDF("id", "v"))
    assert(t.checkConstraints().contains("v_pos"))

    // violating append fails loudly and leaves NO trace
    val before = t.read().count()
    val e = intercept[IllegalStateException] {
      t.append(Seq((4, -1.0)).toDF("id", "v"))
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    assert(t.read().count() == before)
    assert(t.sweepOrphans(graceMs = 0L).isEmpty, "violating dir must be self-cleaned")

    // NULL predicate counts as a violation (SQL CHECK stance)
    intercept[IllegalStateException] {
      t.append(Seq((5, Option.empty[Double])).toDF("id", "v"))
    }

    // overwrite and merge-on-read update are enforced too
    intercept[IllegalStateException] { t.overwrite(Seq((9, -9.0)).toDF("id", "v")) }
    intercept[IllegalStateException] {
      t.updateWhere($"id" === 1, Map("v" -> lit(-5.0)))
    }
    assert(t.read().filter($"v" <= 0).count() == 0)

    // a constraint the current data violates is rejected at add time
    intercept[IllegalStateException] { t.addCheckConstraint("v_gt_15", "v > 15") }
    assert(!t.checkConstraints().contains("v_gt_15"))

    // drop releases enforcement
    t.dropCheckConstraint("v_pos")
    t.append(Seq((6, -6.0)).toDF("id", "v"))
    assert(t.read().filter($"v" < 0).count() == 1)
  }
}
