package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, document
  * fingerprinting. Everything is built from codegen'd
  * `org.apache.spark.sql.functions` (no UDFs), so the whole stage stays
  * inside WholeStageCodegen and scales as a pure map over the corpus —
  * no shuffle, no state, embarrassingly parallel at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens (the baseline tokenizer). */
  def tokensWs(text: Column): Column =
    split(trim(text), "\\s+")

  /** BPE-ish pre-tokenization: runs of lowercase alphanumerics OR a
    * single non-space symbol — the GPT-style pre-split shape, as a pure
    * regex so it stays codegen'd.
    */
  val bpeIshPattern = "[a-z0-9]+|[^a-z0-9\\s]"

  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokensWs(text)))

  /** `textColName` must be a plain column name (used in a SQL
    * expression — Spark exposes regexp_extract_all only in SQL form).
    */
  def tokenCountBpeIsh(textColName: String): Column =
    // \\s doubled: Spark's SQL string literal parser applies C-style
    // unescaping before the regex engine sees the pattern
    size(expr(s"regexp_extract_all(lower($textColName), '[a-z0-9]+|[^a-z0-9\\\\s]', 0)"))

  /** Quality features + a composite score in [0,1]: favors documents of
    * reasonable length with low punctuation density, a healthy stopword
    * ratio and lexical diversity — the standard cheap pre-filter ahead
    * of model-based quality classifiers.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokensWs(t)
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens_q", when(length(trim(t)) === 0, 0).otherwise(size(toks)))
      .withColumn(
        "punct_ratio",
        when(length(t) === 0, 0.0)
          .otherwise(length(regexp_replace(t, "[^.,;:!?]", "")) / length(t).cast("double")))
      // guard on n_tokens_q, NOT size(toks): split("") yields [""] (size
      // 1), so a size-based guard is dead and a blank document would
      // score uniq_ratio 1.0 — diverging from the oracle's
      // `CASE WHEN n_tokens = 0` and letting empty docs outscore prose
      .withColumn(
        "stopword_ratio", {
          val sw = array(Stopwords.en.map(lit): _*)
          when(col("n_tokens_q") === 0, 0.0)
            .otherwise(size(filter(toks, tk => array_contains(sw, tk))) / size(toks).cast("double"))
        })
      .withColumn(
        "uniq_ratio",
        when(col("n_tokens_q") === 0, 0.0)
          .otherwise(size(array_distinct(toks)) / size(toks).cast("double")))
      // floor-form 4-dp rounding: the score is a rational combination, so
      // round(x, 4) can land on a .5 boundary where decimal-string and
      // binary rounding disagree across engines; floor(x*1e4+0.5)
      // evaluates the identical binary double everywhere.
      //
      // The score is SELF-CONTAINED (token array bound ONCE via a
      // single-element transform, features derived from the bound
      // variable) rather than referencing the feature columns above:
      // CollapseProject inlines column references, so a consumer pruning
      // to quality_score alone used to re-evaluate the tokenizing split
      // ~7x per row — all interpreted, because the stopword filter is a
      // higher-order function outside codegen. A lambda variable cannot
      // be inlined, so the split/filter/distinct each run exactly once.
      // Arithmetic and operation order are identical to the column form,
      // so the score stays bit-for-bit equal (oracle-checked).
      .withColumn(
        "quality_score", {
          val sw = array(Stopwords.en.map(lit): _*)
          element_at(
            transform(
              array(toks),
              tks => {
                val nTok = when(length(trim(t)) === 0, 0).otherwise(size(tks))
                val punct = when(length(t) === 0, 0.0)
                  .otherwise(length(regexp_replace(t, "[^.,;:!?]", "")) / length(t).cast("double"))
                val stop = when(nTok === 0, 0.0)
                  .otherwise(size(filter(tks, tk => array_contains(sw, tk))) / size(tks).cast("double"))
                val uniq = when(nTok === 0, 0.0)
                  .otherwise(size(array_distinct(tks)) / size(tks).cast("double"))
                floor(
                  (least(lit(1.0), nTok / lit(100.0)) * lit(0.3) +
                    (lit(1.0) - least(lit(1.0), punct * 5)) * lit(0.2) +
                    least(lit(1.0), stop * 4) * lit(0.2) +
                    uniq * lit(0.3)) * 10000 + 0.5) / 10000.0
              }),
            1)
        })
  }

  /** Language identification: stopword-profile scoring over the five
    * supported languages + a CJK character-class check for Chinese. An
    * n-gram-free heuristic chosen because it is expressible as pure
    * column algebra (single map stage, no shuffle); precision on real
    * prose is validated in TextAnalysisSpec on hand-written fixtures.
    */
  def langId(text: Column): Column = {
    // Single-evaluation shape: the token array is bound ONCE via a
    // single-element transform, then the four stopword scores + the CJK
    // ratio are bound ONCE as a struct the argmax when-chain reads from.
    // The direct when-chain form inlined the tokenizing split ~20x and
    // each score ~3x per row (greatest + per-language comparison), all
    // interpreted because the stopword filter is a higher-order function
    // outside codegen — measured 2.09 s warm vs 0.23 s single-eval on the
    // sf0.1 confusion matrix. A lambda variable cannot be inlined by
    // CollapseProject/SimplifyExtractValueOps, unlike a struct field or a
    // withColumn alias, so this shape is re-expansion-proof. Comparisons
    // and tie order are identical, so predictions match bit for bit.
    def score(tks: Column, words: Seq[String]): Column = {
      val wordArr = array(words.map(lit): _*)
      when(size(tks) === 0, 0.0)
        .otherwise(size(filter(tks, t => array_contains(wordArr, t))) / size(tks).cast("double"))
    }
    val cjkRatio =
      when(length(text) === 0, 0.0)
        .otherwise(length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) / length(text).cast("double"))
    // Chinese wins on any meaningful CJK presence; otherwise argmax of
    // stopword ratios with deterministic tie order en>fr>es>de, 'und'
    // (undetermined) when nothing scores.
    element_at(
      transform(
        array(tokensWs(lower(text))),
        tks =>
          element_at(
            transform(
              array(struct(
                score(tks, Stopwords.en).as("en"),
                score(tks, Stopwords.fr).as("fr"),
                score(tks, Stopwords.es).as("es"),
                score(tks, Stopwords.de).as("de"),
                cjkRatio.as("cjk"))),
              s => {
                val c1 = s.getField("en"); val c2 = s.getField("fr")
                val c3 = s.getField("es"); val c4 = s.getField("de")
                val maxScore = greatest(c1, c2, c3, c4)
                when(s.getField("cjk") > 0.05, lit("zh"))
                  .when(maxScore <= 0.0, lit("und"))
                  .when(c1 === maxScore, lit("en"))
                  .when(c2 === maxScore, lit("fr"))
                  .when(c3 === maxScore, lit("es"))
                  .otherwise(lit("de"))
              }),
            1)),
      1)
  }

  /** Within-document repetition features — the Gopher repetition
    * filters (Rae et al. 2021, "Scaling Language Models", §A1.1): the
    * fraction of tokens taken by the single most frequent token, and
    * the fraction of duplicate 2-gram occurrences. High values mark
    * boilerplate/spam/keyword-stuffing that CROSS-document near-dup
    * detection cannot see (the repetition is inside one document).
    * Pure column algebra — a map stage with no shuffle; `is_repetitive`
    * applies the published-style thresholds (0.3 / 0.2) as an int flag.
    */
  def repetitionFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokensWs(lower(t))
    val n = when(length(trim(t)) === 0, 0).otherwise(size(toks))
    // Max token frequency as the longest run in the SORTED token array —
    // one O(n log n) sort plus one linear fold, instead of re-scanning the
    // array once per distinct token (quadratic on long repetitive docs,
    // exactly the docs this filter exists to catch).
    val maxRun = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, tk) => {
        val run = when(tk === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(
          tk.as("prev"),
          run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val topTokenRatio =
      when(n === 0, 0.0).otherwise(maxRun.cast("double") / n)
    val grams = transform(
      sequence(lit(0), size(toks) - 2),
      j => concat_ws(" ", element_at(toks, j + 1), element_at(toks, j + 2)))
    val dupBigramRatio =
      when(n < 2, 0.0).otherwise(
        (size(grams) - size(array_distinct(grams))).cast("double") / size(grams))
    // floor-form 4-dp rounding (see quality_score): engine-exact rationals
    df.withColumn("top_token_ratio", floor(topTokenRatio * 10000 + 0.5) / 10000.0)
      .withColumn("dup_bigram_ratio", floor(dupBigramRatio * 10000 + 0.5) / 10000.0)
      .withColumn(
        "is_repetitive",
        when(col("top_token_ratio") > 0.3 || col("dup_bigram_ratio") > 0.2, 1).otherwise(0))
  }

  /** PII redaction — the standard scrub pass before training: URLs,
    * then emails, then dotted-quad IPs are replaced with typed
    * placeholder tokens. Patterns are kept to the regex subset shared
    * by Java regex and RE2 so the DuckDB oracle replays them verbatim;
    * order matters (URLs can embed '@', so they are redacted first).
    * One codegen'd map pass, no shuffle.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^\\s]+"
  val ipPattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlPattern, "<URL>"),
        emailPattern,
        "<EMAIL>"),
      ipPattern,
      "<IP>")

  /** Deterministic corpus mixing (domain weighting): keep each document
    * with its source's sampling rate, decided by an md5 hash of the id —
    * the per-domain up/down-sampling step of training-data curation.
    * Like [[graft.queries.ExtQueries]]'s train/val split, the decision
    * is a pure function of (id, weight): stable across runs, engines,
    * partitionings, and corpus growth. Sources absent from `weights`
    * keep `defaultWeight`.
    */
  def mixSources(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): DataFrame = {
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 10000
    val rate = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    df.filter(bucket < rate * 10000)
  }

  /** Token-budget sequence packing: assign each document to a training
    * pack of ≤ `budget` tokens (long docs overflow into their own bin
    * boundary), greedily in id order WITHIN hash shards — the streaming
    * pack construction used to build fixed-budget training batches.
    *
    * Determinism + scale: the shard is a pure md5 function of the id
    * (stable across runs/engines, like [[graft.queries.ExtQueries]]'s
    * train/val split), and the running token sum is a window per shard —
    * state bounded by shard size, `shards` of them in parallel, no
    * global sort. Output key is (shard, pack_bin): bin b holds the docs
    * whose running token offset falls in [b·budget, (b+1)·budget).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      shards: Int = 16): DataFrame = {
    val shard = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % shards).as("shard")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("shard", shard)
      .withColumn("__running", sum(col(tokenCol)).over(w))
      .withColumn(
        "pack_bin",
        floor((col("__running") - col(tokenCol)) / lit(budget.toDouble)).cast("long"))
      .drop("__running")
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the canonical exact-dup key (stable across engines).
    */
  /** Fixed-token-window document chunking with overlap — the context
    * splitter every pretraining / retrieval pipeline runs before
    * embedding or packing. Chunk k covers tokens
    * `[1 + k·stride, 1 + k·stride + chunkTokens)` (stride =
    * chunkTokens − overlap); the last chunk is the first one reaching
    * the document end, so no trailing chunk is a strict subset of its
    * predecessor. Blank documents produce no chunks.
    *
    * Pure per-row column algebra (tokenize → computed chunk count →
    * `posexplode` of the chunk index): a map stage that scales linearly
    * with corpus size, no shuffle, no state.
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunk=$chunkTokens overlap=$overlap")
    val stride = chunkTokens - overlap
    val toks = tokensWs(trim(col(textCol)))
    val n = size(toks)
    // chunks = 1 + ceil((n - chunkTokens) / stride), floored at 1
    val extra = greatest(lit(0),
      ((n - chunkTokens + stride - 1).cast("double") / stride).cast("int"))
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), toks.as("__toks"), (extra + 1).as("__k"))
      .select(
        col(idCol),
        col("__toks"),
        posexplode(sequence(lit(0), col("__k") - 1)))
      .select(
        col(idCol),
        col("col").cast("int").as("chunk_idx"),
        slice(col("__toks"), col("col") * stride + 1, lit(chunkTokens)).as("__c"))
      .select(
        col(idCol),
        col("chunk_idx"),
        size(col("__c")).as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** Chunk-level duplication stats — the line-dedup analog (CCNet /
    * RefinedWeb remove lines repeated across a corpus; for this corpus
    * the unit is a non-overlapping `chunkTokens`-token window): per
    * document, how many of its chunks appear more than once ANYWHERE in
    * the corpus (including its own other positions). High ratios mark
    * boilerplate-wrapped or templated documents even when no whole-doc
    * dup exists. Scale shape: one map stage to explode chunks, one
    * shuffle (count over the chunk-fingerprint partition), one per-doc
    * re-aggregation — the raw text never moves twice, only
    * (id, fingerprint) pairs.
    *
    * Output: (idCol, n_chunks, n_dup_chunks, dup_chunk_ratio).
    */
  def chunkDupStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 32): DataFrame = {
    require(chunkTokens > 0, s"need chunkTokens > 0, got $chunkTokens")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val chunks = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), toks.as("__toks"))
      .select(
        col(idCol),
        explode(
          expr(
            s"transform(sequence(0, cast(ceil(size(__toks) / ${chunkTokens}.0) as int) - 1), " +
              s"i -> md5(array_join(slice(__toks, i * $chunkTokens + 1, $chunkTokens), ' ')))"))
          .as("fp"))
    // groupBy+join instead of count().over(partitionBy(fp)): a window
    // funnels every occurrence of a hot fingerprint (a boilerplate chunk
    // repeated 10M×) through ONE task; the hash-agg side combines
    // map-side so the hot key ships as one partial per task, and the
    // join back is fp-to-fp with no skew amplification.
    val occCounts = chunks.groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
    chunks
      .join(occCounts, "fp")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      // floor-form 4-dp rounding: engine-exact on .5 boundaries (see
      // Dedup.ngramJaccardPairs)
      .withColumn(
        "dup_chunk_ratio",
        floor(col("n_dup_chunks").cast("double") / col("n_chunks") * 10000 + 0.5) / 10000.0)
  }

  /** BM25 (Okapi, Lucene's +1 idf variant) top-k retrieval for a fixed
    * literal query — the lexical-search baseline every RAG / curation
    * stack keeps next to its embedding index.
    *
    * Scale shape: document lengths are a PURE PROJECTION (token count,
    * no explode); corpus size and average doc length are one scalar
    * aggregate broadcast back as a 1-row cross join; the postings
    * explode is immediately filtered to the literal query terms (a
    * codegen'd `isin` — at 100 TB the scan emits only matching
    * postings, a tiny fraction of the corpus); document frequencies
    * aggregate to |Q| rows and broadcast-join back. The only wide
    * operation over matching docs is one hash aggregation keyed on the
    * doc id; the final top-k is TakeOrderedAndProject (no global sort).
    *
    * Determinism (what makes this oracle-checkable): the per-document
    * score is NOT a `sum()` over an unordered term set — float addition
    * order would differ across engines. Each query term gets its own
    * aggregate column and the total is added in QUERY-TERM ORDER, a
    * fixed left-to-right float expression both engines evaluate
    * identically; ranking uses the 4-dp rounded score with ties to the
    * lowest id.
    */
  def bm25TopK(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      topK: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    // corpus tokens are lowercased below, so query terms must be too — a
    // mixed-case term would otherwise contribute silently-zero matches
    val queryTermsLc = queryTerms.map(_.toLowerCase)
    val lens = corpus.select(
      col(idCol).as("id"),
      tokenCountWs(col(textCol)).cast("long").as("dl"))
    val stats = lens.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val postings = corpus
      .select(
        col(idCol).as("id"),
        explode(tokensWs(lower(col(textCol)))).as("term"))
      .filter(col("term").isin(queryTermsLc: _*))
    val tf = postings.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = postings
      .groupBy(col("term"))
      .agg(countDistinct(col("id")).as("df"))
    val scoredTerms = tf
      .join(broadcast(dfreq), "term")
      .join(lens, "id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn(
        "idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn(
        "s",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    // one aggregate column per query term, then a FIXED-ORDER float add:
    // the score expression tree is identical in every engine. Columns
    // are named POSITIONALLY (s_0, s_1, …) — a term containing '.' or
    // '`' must never leak into a column reference — and duplicate terms
    // collapse (a repeated term would otherwise create an ambiguous
    // aggregate column)
    val terms = queryTermsLc.distinct
    val termCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("term") === t, col("s"))), lit(0.0)).as(s"s_$i")
    }
    val perTerm = scoredTerms
      .groupBy(col("id"))
      .agg(termCols.head, termCols.tail: _*)
    val total = terms.indices.map(i => col(s"s_$i")).reduceLeft(_ + _)
    val ranked = perTerm
      .withColumn("score", round(total, 4))
      .select(col("id").as(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
    // rank over the ≤topK surviving rows only (constant partition key
    // keeps WindowExec off the full corpus — same pattern as
    // vocabCoverage)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0))
      .orderBy(col("score").desc, col(idCol).asc)
    ranked
      .withColumn("rank", row_number().over(w))
      .select(col(idCol), col("score"), col("rank"))
  }

  /** Exact repeated-SPAN statistics (the substring-dedup measure of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better", arXiv 2107.06499, §3 ExactSubstr): for every
    * position, the L-token shingle starting there; a position is
    * "repeated" when its shingle occurs ≥2 times in the corpus
    * (anywhere — same doc counts, as in the paper); per document,
    * repeated positions merge into covered intervals whose union length
    * is the repeated-token count. Where [[chunkDupStats]] sees only
    * aligned fixed chunks, this catches repeats at ANY offset — the
    * suffix-array result, computed with shingle-join machinery that
    * distributes.
    *
    * Scale shape: shingling is a pure projection (one row per token
    * position — the same linear blow-up the suffix array pays);
    * occurrence counts are a map-side-combined hash agg + equi-join
    * back (NOT a window over the shingle — a boilerplate span repeated
    * 10 M× would funnel one task); the interval merge is a per-DOC
    * window bounded by document length. Shingle keys here are the raw
    * L-token strings so the DuckDB oracle can replay them verbatim; at
    * 100 TB you'd xxhash64 them first (same plan, 8-byte keys).
    *
    * Output: (idCol, n_tokens, rep_tokens, rep_ratio 4-dp).
    */
  def repeatedSpanStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int): DataFrame = {
    require(spanTokens > 0, s"need spanTokens > 0, got $spanTokens")
    val L = spanTokens
    val base = df
      .select(col(idCol), tokensWs(lower(col(textCol))).as("__toks"))
      // split("") yields [""]: an empty/whitespace doc has 0 tokens
      .withColumn(
        "n",
        when(
          size(col("__toks")) === 1 && length(col("__toks").getItem(0)) === 0, 0)
          .otherwise(size(col("__toks"))))
    val sh = base
      .filter(col("n") >= L)
      .select(
        col(idCol),
        col("n"),
        posexplode(
          transform(
            sequence(lit(0), col("n") - L),
            i => array_join(slice(col("__toks"), i + 1, lit(L)), " "))).as(Seq("pos", "sh")))
    val repeated = sh
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("sh"))
    val rep = sh.join(repeated, "sh").select(col(idCol), col("n"), col("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("pos"))
    val covered = rep
      .withColumn("nxt", lead(col("pos"), 1).over(w))
      .withColumn(
        "cov",
        when(col("nxt").isNull, lit(L)).otherwise(least(lit(L), col("nxt") - col("pos"))))
      .groupBy(col(idCol))
      .agg(sum(col("cov")).as("rep_tokens"))
    base
      .select(col(idCol), col("n"))
      .join(covered, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n").cast("long").as("n_tokens"),
        coalesce(col("rep_tokens"), lit(0L)).cast("long").as("rep_tokens"),
        when(col("n") === 0, lit(0.0)).otherwise(
          floor(
            coalesce(col("rep_tokens"), lit(0L)).cast("double") / col("n").cast("double")
              * 10000 + 0.5) / 10000.0).as("rep_ratio"))
  }

  def fingerprintMd5(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Rolling polynomial fingerprint over token hashes (order-sensitive,
    * Rabin-Karp style): fp = Σ h(tok_i)·31^(n-i) mod p, reduced at
    * every step so the arithmetic stays within Long under ANSI mode.
    */
  def fingerprintRolling(text: Column): Column = {
    val p = 1000000007L
    aggregate(
      transform(tokensWs(lower(text)), t => pmod(xxhash64(t), lit(p))),
      lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, lit(p)))
  }

  /** Per-document character-level Shannon entropy over the 26 ASCII
    * letters — the cheap information-density quality signal (low-entropy
    * text is boilerplate/repetition; the CCNet/Gopher-family filters'
    * compression-ratio cousin, expressed so any engine replays it):
    * each letter count is `length(t) − length(replace(t, letter, ''))`
    * — 26 vectorized string ops, NO per-character explode (an explode
    * would shuffle corpus-length× rows; this stays a map-only pass) —
    * and H = −Σ (c/n)·ln(c/n) over letters present. Terms are summed in
    * fixed a→z order so the float reduction is order-deterministic and
    * cross-engine reproducible at 4 dp.
    *
    * Appends `n_letters` (int) and `entropy` (double, 4 dp, 0.0 for
    * letterless text).
    */
  def charEntropy(df: DataFrame, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val counts = ('a' to 'z').map(l => length(t) - length(replace(t, lit(l.toString), lit(""))))
    val n = counts.reduceLeft(_ + _)
    val nd = n.cast("double")
    val terms = counts.map { c =>
      when(c > 0, -(c.cast("double") / nd) * log(c.cast("double") / nd)).otherwise(lit(0.0))
    }
    df.withColumn("n_letters", n)
      .withColumn("entropy", when(n === 0, 0.0).otherwise(round(terms.reduceLeft(_ + _), 4)))
  }

  /** DuckDB replay of [[charEntropy]] as a SELECT-list fragment pair:
    * (letter-count CTE columns, entropy expression) — kept HERE so the
    * Spark fold order and the SQL fold order can never drift apart.
    */
  def charEntropySqlParts: (String, String) = {
    val letters = ('a' to 'z').map(_.toString)
    val countCols = letters
      .map(l => s"length(t) - length(replace(t, '$l', '')) AS c_$l")
      .mkString(",\n         ")
    val n = letters.map(l => s"c_$l").mkString(" + ")
    val terms = letters
      .map(l => s"CASE WHEN c_$l > 0 THEN -(CAST(c_$l AS DOUBLE) / nd) * ln(CAST(c_$l AS DOUBLE) / nd) ELSE 0.0 END")
      .mkString("\n           + ")
    (s"$countCols,\n         $n AS n_letters", terms)
  }
}

/** Minimal stopword profiles (public common-word lists, truncated to
  * the highest-frequency function words — enough to separate the five
  * target languages).
  */
object Stopwords {
  val en = Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "was",
    "for", "on", "are", "with", "as", "his", "they", "at", "be", "this")
  val fr = Seq("le", "la", "les", "de", "des", "du", "et", "un", "une", "dans",
    "est", "pour", "que", "qui", "sur", "avec", "pas", "au", "ce", "il")
  val es = Seq("el", "la", "los", "las", "de", "del", "y", "un", "una", "en",
    "es", "por", "que", "con", "para", "su", "al", "lo", "como", "más")
  val de = Seq("der", "die", "das", "und", "ein", "eine", "in", "ist", "von",
    "mit", "den", "des", "dem", "nicht", "auch", "auf", "für", "sich", "im", "zu")
}
