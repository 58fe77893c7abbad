package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compression half of the IVF-PQ
  * index that makes billion-vector ANN feasible: split each vector
  * into `m` subspaces, k-means each subspace independently, store one
  * centroid id per subspace. A 64-dim fp32 embedding (256 B) becomes
  * `m` small ints packed into ONE long (8 B) — 32× compression with a
  * bounded reconstruction error, and asymmetric-distance (ADC) scoring
  * against the codebooks never touches the original vectors.
  *
  * Scale shape (the same contract as [[Clustering]]): codebooks live
  * on the driver as plan literals (m·k·dsub doubles — KBs), so
  * ENCODING IS A PURE PROJECTION over the corpus — per subspace an
  * argmin fold over literal centroids, no shuffle, no join. Training
  * shuffles only (subspace·cluster, dim)-keyed partial sums (map-side
  * combined, ≤ m·k·dsub rows per task). The corpus is never collected,
  * cached, or repartitioned.
  *
  * Determinism (what makes the result oracle-checkable in another
  * engine): per subspace, seeds are the k lowest-id subvectors
  * (cluster id = rank in id order); assignment ranks by 6-dp-rounded
  * SEQUENTIAL squared L2 ([[graft.functions.VectorExprs.ArrayL2Sq]])
  * with ties to the LOWEST centroid id; centroid means are exact
  * integer-scaled 4-dp values ([[Embeddings.groupCentroidComponents]]).
  * Every engine replaying those rules produces bit-identical codes.
  */
object ProductQuant {

  /** One trained subspace: `cid -> centroid` in cid order. */
  type Codebook = Seq[(Int, Seq[Double])]

  private def subvec(vec: Column, j: Int, dsub: Int): Column =
    slice(vec, j * dsub + 1, dsub)

  /** Scored literal-centroid argmin: struct(-d2_6dp, -cid) so
    * array_max's lexicographic compare IS "min rounded distance, ties
    * -> min centroid id".
    */
  private def bestCode(df: DataFrame, sub: Column, codebook: Codebook): Column = {
    val spark = df.sparkSession
    -array_max(array(codebook.map { case (cid, cv) =>
      struct(
        -round(graft.functions.VectorExprs.arrayL2Sq(spark, sub, typedlit(cv)), 6).as("d"),
        lit(-cid).as("nc"))
    }: _*)).getField("nc")
  }

  /** Train per-subspace codebooks with `iters` Lloyd rounds each.
    * All m subspaces train CONCURRENTLY in each round: one assignment
    * projection emitting (subspace-tagged cluster, subvector) rows and
    * one centroid aggregation per round — not m separate jobs.
    */
  def pqFit(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      iters: Int): Seq[Codebook] = {
    val seeds = corpus
      .orderBy(col(idCol))
      .limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }
    val dim = seeds.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m

    var books: Seq[Codebook] = (0 until m).map { j =>
      seeds.toSeq.map { case (cid, v) => (cid, v.slice(j * dsub, j * dsub + dsub)) }
    }

    (1 to iters).foreach { _ =>
      // one pass: per subspace j, tag the winning cluster with key
      // j*k+cid, explode all m tagged subvectors, aggregate every
      // (subspace, cluster) centroid in a single map-side-combined agg
      val tagged = corpus.select(
        explode(array((0 until m).map { j =>
          val sub = subvec(col(vecCol), j, dsub)
          struct(
            (bestCode(corpus, sub, books(j)).cast("int") + lit(j * k)).as("g"),
            transform(sub, x => x.cast("double")).as("sv"))
        }: _*)).as("t"))
        .select(col("t.g").as("g"), col("t.sv").as("sv"))
      val comps = Embeddings
        .groupCentroidComponents(tagged, "g", "sv")
        .groupBy(col("g"))
        .agg(
          transform(
            sort_array(collect_list(struct(col("dim"), col("c")))),
            p => p.getField("c")).as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .toSeq
        .sortBy(_._1)
      books = (0 until m).map { j =>
        comps.collect { case (g, c) if g / k == j => (g % k, c) }
      }
    }
    books
  }

  /** Encode the corpus: (id, code) where `code` packs the m per-
    * subspace centroid ids base-k into one BIGINT (subspace 0 in the
    * lowest digits), plus the exact 6-dp reconstruction error — the
    * squared L2 between the vector and its codebook reconstruction.
    * Pure projection; the packed long is the stored index column.
    */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      books: Seq[Codebook],
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val m = books.length
    val dsub = books.head.head._2.length
    val codes = (0 until m).map { j =>
      bestCode(corpus, subvec(col(vecCol), j, dsub), books(j)).cast("long").as(s"c_$j")
    }
    val withCodes = corpus.select(col(idCol) +: col(vecCol).as("__v") +: codes: _*)
    val packed = (0 until m)
      .map(j => col(s"c_$j") * lit(math.pow(k, j).toLong))
      .reduceLeft(_ + _)
    // recon error: Σ_j d2(sub_j, centroid[code_j]) — per subspace a
    // literal CASE over k centroids, summed in subspace order
    val err = (0 until m)
      .map { j =>
        val sub = subvec(col("__v"), j, dsub)
        books(j).foldLeft(lit(0.0)) { case (acc, (cid, cv)) =>
          when(
            col(s"c_$j") === cid,
            round(graft.functions.VectorExprs.arrayL2Sq(spark, sub, typedlit(cv)), 6))
            .otherwise(acc)
        }
      }
      .reduceLeft(_ + _)
    withCodes.select(
      col(idCol),
      packed.as("code"),
      round(err, 6).as("recon_d2"))
  }

  /** Asymmetric-distance (ADC) top-k: score every ENCODED vector
    * against a raw query by summing, per subspace, the query-to-
    * centroid dot product of the vector's code — one lookup-table
    * probe per subspace, never touching the original corpus vectors.
    * `queries`: (qid, full query vector). Returns per query the topK
    * (qid, id, adc_dot) by descending approximate dot product, ties
    * to lowest id. The LUT (m·k doubles per query) rides the plan as
    * literals; scoring an encoded corpus row is integer digit
    * extraction + literal array indexing — no vector math at probe
    * time, which is the entire point of PQ at 100 TB.
    */
  def adcTopK(
      encoded: DataFrame,
      idCol: String,
      books: Seq[Codebook],
      k: Int,
      queries: Seq[(Long, Seq[Double])],
      topK: Int): DataFrame = {
    val m = books.length
    val dsub = books.head.head._2.length
    val spark = encoded.sparkSession
    import spark.implicits._
    val perQuery = queries.map { case (qid, qv) =>
      // LUT[j][cid] = dot(q_j, centroid_j_cid), folded in Scala (driver
      // side, m·k·dsub multiplies — microseconds)
      val lut: Seq[Seq[Double]] = (0 until m).map { j =>
        val qj = qv.slice(j * dsub, j * dsub + dsub)
        books(j).map { case (_, cv) =>
          qj.zip(cv).foldLeft(0.0) { case (s, (a, b)) => s + a * b }
        }
      }
      val score = (0 until m)
        .map { j =>
          // digit j of the packed code, base k
          val cj = (col("code") / lit(math.pow(k, j).toLong)).cast("long") % k
          element_at(typedlit(lut(j)), (cj + 1).cast("int"))
        }
        .reduceLeft(_ + _)
      encoded
        .select(lit(qid).as("qid"), col(idCol), round(score, 6).as("adc_dot"))
        .orderBy(col("adc_dot").desc, col(idCol).asc)
        .limit(topK)
    }
    perQuery.reduceLeft(_ unionByName _)
  }
}
