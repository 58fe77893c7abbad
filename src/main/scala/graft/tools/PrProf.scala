package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic: phase-level timing of the pagerank plan at a
  * given sf directory (build vs per-iteration cost).
  */
object PrProf {
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
      println(f"PHASE $label%-16s ${(System.nanoTime()-s)/1e9}%.2f s")
      r
    }
    val micro = 1000000L
    val orders = spark.read.parquet(s"$sfDir/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
    // single-pass edge build, mirroring pagerankPurchases (r19): the
    // two-frame pairs-then-union build put 91 of sf10's ~130 s here
    val edges = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c_node"), (col("l_suppkey") * 2 + 1).as("s_node"))
      .distinct()
      .select(explode(array(
        struct(col("c_node").as("src"), col("s_node").as("dst")),
        struct(col("s_node").as("src"), col("c_node").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("edges build")(edges.count())
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nV = t("deg")(deg.count())
    val nodes = deg.select(col("src").as("node"))
    def vSized(df: DataFrame): DataFrame = if (nV <= 2000000L) broadcast(df) else df
    val r0 = nodes.withColumn("rank", lit(micro))
    var r: DataFrame = r0
    for (i <- 1 to 3) {
      val weights = r.withColumnRenamed("node", "src")
        .join(vSized(deg), Seq("src"))
        .select(col("src"), expr("rank div out_deg").as("c"))
      val contrib = edges.join(vSized(weights), Seq("src")).select(col("dst"), col("c"))
      val inMass = contrib.groupBy(col("dst")).agg(sum(col("c")).as("mass"))
      val next = nodes
        .join(vSized(inMass.withColumnRenamed("dst", "node")), Seq("node"), "left")
        .select(col("node"), coalesce(col("mass"), lit(0L)).as("mass"))
        .select(col("node"), (lit(150000L) + expr("(mass * 17) div 20")).as("rank"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t(s"iteration $i")(next.count())
      if (i > 1) r.unpersist(blocking = false)
      r = next
    }
    t("top20")(r.orderBy(col("rank").desc, col("node").asc).limit(20).collect().length)
    spark.stop()
  }
}
