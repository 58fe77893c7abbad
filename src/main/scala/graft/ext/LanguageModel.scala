package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical language-model scoring for corpus quality filtering —
  * the CCNet-style "score every candidate document under a reference
  * LM, drop the tail" pass (Wenzek et al. 2020 use a 5-gram KenLM; the
  * same pipeline shape holds for any n). Implemented as a bigram model
  * with add-k smoothing: small enough to train as a pair of aggregations
  * yet enough to separate fluent text from token soup.
  *
  * Scale shape: the model IS a DataFrame (bigram counts + unigram
  * counts), so training is two hash aggregations with map-side partial
  * combine, and scoring is a join of the exploded document bigrams
  * against the model on the gram key — both sides hash-partitioned on
  * that key, no broadcast of an unbounded vocabulary required (Catalyst
  * still broadcasts the unigram side automatically when the vocabulary
  * fits). Nothing is collected to the driver; vocabulary size enters
  * the smoothing formula via a 1-row cross join.
  */
object LanguageModel {

  /** Per-document average negative log-likelihood under a bigram model
    * with add-`k` smoothing, trained on the corpus itself:
    *
    *   nll(doc) = avg over bigrams (w1, w2) of
    *              -ln( (c(w1,w2) + k) / (c(w1) + k·V) )
    *
    * where c(·) are corpus occurrence counts and V the unigram
    * vocabulary size. Low scores = fluent/common phrasing, high scores
    * = rare or garbled sequences — threshold on the output to filter.
    * Documents with fewer than 2 tokens have no bigrams and are
    * excluded. Output: (idCol, n_bigrams, avg_nll rounded to 4).
    */
  def bigramNll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 0.5): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val base = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), toks.as("toks"))

    // One row per bigram occurrence, keyed (w1, w2). Deliberately NOT
    // cached or checkpointed: the model-count branch and the scoring
    // branch re-derive it independently, and Catalyst column-prunes the
    // model branch down to bare (w1, w2) — a second cheap map pass.
    // Caching the wide gram table would write MORE bytes to executor
    // storage than the recompute reads, pin them for the session
    // (persist has no release point here — the caller owns the result's
    // lifetime), and a localCheckpoint would truncate lineage so an
    // executor loss fails the job instead of recomputing.
    val grams = base
      .select(
        col(idCol),
        explode(
          zip_with(
            slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
            slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col(idCol), col("g.w1").as("w1"), col("g.w2").as("w2"))

    val unigrams = base
      .select(explode(col("toks")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("c1"))
    val bigrams = grams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val vocab = unigrams.agg(count(lit(1)).as("v"))

    // Attach the vocabulary-size scalar to the (bounded) unigram model,
    // not the unbounded gram stream: the 1-row nested-loop join then
    // touches |V| rows once instead of every bigram occurrence, and the
    // smoothed denominator ships through the history join pre-computed.
    val histories = unigrams
      .crossJoin(broadcast(vocab))
      .select(col("w"), (col("c1") + col("v") * k).as("denom"))

    // Fold the smoothed NLL into the MODEL first: bigrams ⋈ histories is
    // a |distinct bigrams|-row join of two already-aggregated tables
    // (each bigram has exactly one count row and w1 exactly one history
    // row, so this is row-preserving), and the corpus-sized gram stream
    // then probes ONE model table instead of two — the second full-gram
    // join pass (every occurrence re-probed against the unigram side)
    // is gone, and the nll expression is evaluated once per DISTINCT
    // bigram instead of once per occurrence. Same expression tree on
    // the same values, so the doubles are bit-identical.
    val model = bigrams
      .join(histories, bigrams("w1") === histories("w"))
      .select(col("w1"), col("w2"), (-log((col("c12") + k) / col("denom"))).as("nll"))

    grams
      .join(model, Seq("w1", "w2"))
      .select(col(idCol), col("nll"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("nll")), 4).as("avg_nll"))
  }
}
