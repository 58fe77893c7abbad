package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the
  * clustering primitive of corpus curation (SemDeDup-style semantic
  * dedup, IVF index training, topic-balanced sampling all start here).
  *
  * Scale shape (the same contract as [[Similarity.ivfTopK]]'s internal
  * Lloyd step): centroids live on the driver as plan literals (k × dim
  * doubles — KBs), so per-iteration assignment is a PURE PROJECTION over
  * the corpus — an argmax fold over the literal centroid array, no
  * shuffle, no join. The only shuffle per iteration is the centroid
  * update: a (cluster, dim)-keyed aggregation, map-side combined, whose
  * shuffle carries at most k·dim partial rows per task. The corpus is
  * never repartitioned, cached, or collected; each iteration is one
  * scan. k is a model parameter (pick ~N/target_cluster_size at scale),
  * NOT a partition count.
  *
  * Determinism (what makes the result oracle-checkable in another
  * engine): seeds are the k lowest-id vectors; assignment ranks by
  * 6-dp-rounded cosine with ties to the LOWEST cluster id; centroid
  * means are exact integer-scaled 4-dp values (order-independent —
  * see [[Embeddings.groupCentroidComponents]]), so every engine that
  * replays these rules lands on bit-identical clusters.
  */
object Clustering {

  /** Fit `iters` Lloyd iterations; returns the final (clusterId,
    * centroid) list, cluster ids being seed ranks (0-based, in id
    * order). Clusters that lose all members drop out.
    */
  def kmeansFit(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Seq[(Int, Seq[Double])] = {
    // seeds: the k lowest-id vectors; cluster id = rank in id order.
    // Only the k seed rows are ever row-numbered or collected.
    var centroids: Seq[(Int, Seq[Double])] = corpus
      .orderBy(col(idCol))
      .limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("c"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
      .toSeq

    (1 to iters).foreach { _ =>
      val assigned = corpus.select(
        (-bestOf(centroids, corpus, col(vecCol)).getField("nc")).cast("int").as("cluster"),
        col(vecCol))
      centroids = Embeddings
        .groupCentroidComponents(assigned, "cluster", vecCol)
        .groupBy(col("cluster"))
        .agg(
          transform(
            sort_array(collect_list(struct(col("dim"), col("c")))),
            p => p.getField("c")).as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .toSeq
        .sortBy(_._1)
    }
    centroids
  }

  /** Literal-centroid score array: one struct(sim6, -cid) per centroid.
    * The 6-dp rounding and negated id make array_max's lexicographic
    * compare exactly "max rounded sim, ties -> min cluster id" — the
    * deterministic assignment rule every oracle replays. Shared with
    * [[Similarity.ivfTopK]], whose probe step needs the whole scored
    * array (top-nprobe lists), not just the argmax.
    */
  private[ext] def scoredArray(
      centroids: Seq[(Int, Seq[Double])],
      spark: org.apache.spark.sql.SparkSession,
      vec: Column): Column =
    array(centroids.map { case (cid, cv) =>
      struct(
        round(graft.functions.VectorExprs.arrayCosine(spark, vec, typedlit(cv)), 6).as("s"),
        lit(-cid).as("nc"))
    }: _*)

  /** Scored literal-centroid argmax: struct(sim6, -cid), so array_max's
    * lexicographic compare IS "max rounded sim, ties -> min cluster id".
    */
  private def bestOf(
      centroids: Seq[(Int, Seq[Double])],
      corpus: DataFrame,
      vec: Column): Column =
    array_max(scoredArray(centroids, corpus.sparkSession, vec))

  /** Run `iters` Lloyd iterations and return the final assignment:
    * one row per input vector — (idCol, cluster, cosine), where
    * `cosine` is the 6-dp similarity to the winning centroid.
    */
  def kmeansAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val b = bestOf(kmeansFit(corpus, idCol, vecCol, k, iters), corpus, col(vecCol))
    corpus.select(
      col(idCol),
      (-b.getField("nc")).cast("int").as("cluster"),
      b.getField("s").as("cosine"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    * 2303.09540): cluster the corpus, then mark near-duplicate PAIRS
    * only WITHIN each cluster — the pairwise cost drops from O(N²) to
    * O(Σ|cluster|²), and with k sized to N/target the per-cluster work
    * is constant. Returns (id_a, id_b, cosine) with id_a < id_b and
    * 6-dp cosine at or above `threshold`. Assignment is the same pure
    * projection as [[kmeansAssign]] (no corpus re-join); the only wide
    * operation is the within-cluster self-join, keyed on cluster id.
    *
    * Recall caveat (inherent to the method): a pair split across two
    * clusters is missed — at cosine ~1.0 (true duplicates) both members
    * assign identically, so dup recall is 1; borderline pairs near the
    * threshold can fall on a cluster seam. That is the SemDeDup trade.
    */
  def semanticDedupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      k: Int,
      iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    val centroids = kmeansFit(corpus, idCol, vecCol, k, iters)
    // ONE assignment frame, self-joined on aliases: both join sides share a
    // byte-identical plan up to the cluster-keyed exchange, so Spark's
    // ReuseExchange computes the corpus scan + argmax projection ONCE and
    // feeds both sides from the same shuffle files (PlanAuditSpec pins the
    // ReusedExchange node). Distinct column names per side (the previous
    // shape) defeat canonicalization and double the heaviest stage.
    val assigned = corpus.select(
      (-bestOf(centroids, corpus, col(vecCol)).getField("nc")).cast("int").as("cluster"),
      col(idCol).as("id"),
      col(vecCol).as("vec"))
    assigned
      .alias("a")
      // merge hint: broadcasting a corpus-sized side is never right at
      // scale, and a shuffle join is what makes the two sides' exchanges
      // canonically equal so the scan+argmax stage is computed once
      .hint("merge")
      .join(assigned.alias("b").hint("merge"), col("a.cluster") === col("b.cluster"))
      .filter(col("a.id") < col("b.id"))
      .withColumn(
        "cosine",
        round(graft.functions.VectorExprs.arrayCosine(spark, col("a.vec"), col("b.vec")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
