package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic: phase-level timing of the triangle-count plan
  * (build vs orientation vs adjacency vs intersect) at a given sf dir.
  */
object TriProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"PHASE $label%-16s ${(System.nanoTime()-s)/1e9}%.2f s  -> $r")
      r
    }
    val po = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edgesJoin = po.select(col("o"), col("p").as("p1"))
      .join(po.select(col("o"), col("p").as("p2")), Seq("o"))
      .where(col("p1") < col("p2"))
      .select(col("p1"), col("p2"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("edges-join")(edgesJoin.count())
    edgesJoin.unpersist(blocking = false)
    // variant: order-local pair generation — one groupBy(o) instead of
    // distinct + self-join; pairs expand map-side from the sorted
    // per-order part array
    val edges = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o")).agg(array_sort(array_distinct(collect_list(col("p")))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS p1, y AS p2))))")).as("e"))
      .select(col("e.p1").as("p1"), col("e.p2").as("p2"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = t("edges-grouped")(edges.count())
    val deg = edges.select(col("p1").as("n"))
      .unionByName(edges.select(col("p2").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNodes = t("deg")(deg.count())
    def vSized(df: DataFrame): DataFrame =
      if (nNodes <= 2000000L) broadcast(df) else df
    def eSized(df: DataFrame): DataFrame =
      if (nNodes <= 2000000L && nEdges <= 8000000L) broadcast(df) else df
    val lowFirst = col("d1") < col("d2") ||
      (col("d1") === col("d2") && col("p1") < col("p2"))
    val oriented = edges
      .join(vSized(deg.select(col("n").as("p1"), col("d").as("d1"))), Seq("p1"))
      .join(vSized(deg.select(col("n").as("p2"), col("d").as("d2"))), Seq("p2"))
      .select(
        when(lowFirst, col("p1")).otherwise(col("p2")).as("src"),
        when(lowFirst, col("p2")).otherwise(col("p1")).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("oriented")(oriented.count())
    edges.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    val adj = oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nbr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("adj")(adj.count())
    val tri = oriented
      .join(eSized(adj.select(col("src"), col("nbr").as("na"))), Seq("src"))
      .join(eSized(adj.select(col("src").as("dst"), col("nbr").as("nb"))), Seq("dst"))
      .select(size(array_intersect(col("na"), col("nb"))).as("t"))
      .agg(sum(col("t")).as("t"))
    t("intersect")(tri.collect()(0).getLong(0))
    // variant: shuffle-hash join on the adj build sides (no sort of
    // the array-carrying stream side)
    val tri2 = oriented
      .join(eSized(adj.select(col("src"), col("nbr").as("na"))).hint("shuffle_hash"), Seq("src"))
      .join(eSized(adj.select(col("src").as("dst"), col("nbr").as("nb"))).hint("shuffle_hash"), Seq("dst"))
      .select(size(array_intersect(col("na"), col("nb"))).as("t"))
      .agg(sum(col("t")).as("t"))
    t("intersect-shj")(tri2.collect()(0).getLong(0))
    spark.stop()
  }
}
