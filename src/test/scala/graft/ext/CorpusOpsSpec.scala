package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedExact keeps exactly n per stratum, whole strata when smaller") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++ (1 to 3).map(i => (1000L + i, "small")))
      .toDF("id", "stratum")
    val out = Sampling.stratifiedExact(df, "id", "stratum", 10)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("big" -> 10L, "small" -> 3L))
  }

  test("stratifiedExact is deterministic and hash-ordered, not input-ordered") {
    val df = (1 to 50).map(i => (i.toLong, "s")).toDF("id", "stratum")
    val shuffled = df.orderBy(rand(42))
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedExact(d, "id", "stratum", 5).collect().map(_.getLong(0)).toSet
    val a = ids(df)
    assert(ids(shuffled) == a, "sample must not depend on input order")
    // hash order: the picked set is the 5 smallest (bucket, id), which for
    // md5 hashing is not simply ids 1..5
    assert(a != (1L to 5L).toSet, s"suspicious: sample equals first-ids $a")
  }

  test("prioritySample: weight-proportional without replacement, deterministic, top-k plan") {
    // 200 light docs (weight 10) + 200 heavy docs (weight 1000): a
    // weight-proportional 100-sample must be dominated by heavy docs
    // (inclusion odds 100:1), while a uniform sample would split ~50/50
    val df = ((1L to 200L).map(i => (i, 10)) ++ (201L to 400L).map(i => (i, 1000)))
      .toDF("id", "w")
    val picked = Sampling.prioritySample(df, "id", col("w"), 100)
      .collect().map(r => r.getLong(0))
    assert(picked.length == 100)
    val heavy = picked.count(_ > 200L)
    assert(heavy > 90, s"only $heavy/100 picks were heavy-weight docs")
    // pure function of id: input order cannot change the sample
    val again = Sampling.prioritySample(df.orderBy(rand(3)), "id", col("w"), 100)
      .collect().map(_.getLong(0))
    assert(picked.toSet == again.toSet)
    // scale shape: global top-k plans bounded, never a full sort
    val p = Sampling.prioritySample(df, "id", col("w"), 100).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("shardShuffle: dense per-shard positions, full coverage, input-order independence") {
    val df = (1L to 200L).toDF("id")
    val out = Sampling.shardShuffle(df, "id", 8, "s1")
      .select("id", "shard", "pos").collect()
    assert(out.length == 200)
    assert(out.map(_.getInt(1)).forall(s => s >= 0 && s < 8))
    // positions are dense 1..n within every shard
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // pure function of (seed, id): a shuffled input yields the identical mapping
    val again = Sampling.shardShuffle(df.orderBy(rand(7)), "id", 8, "s1")
      .select("id", "shard", "pos").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
      again.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("shardShuffle: different seeds permute independently") {
    val df = (1L to 200L).toDF("id")
    def perm(seed: String) =
      Sampling.shardShuffle(df, "id", 8, seed)
        .select("id", "shard", "pos").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val p1 = perm("epoch0")
    val p2 = perm("epoch1")
    // epochs must not reuse the same order: most ids land elsewhere
    val moved = (1L to 200L).count(i => p1(i) != p2(i))
    assert(moved > 150, s"only $moved/200 ids moved between seeds")
  }
}

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization bounds reconstruction error by scale/2 and hits the clamp at max") {
    val df = Seq(
      (1L, Seq(0.5f, -1.27f, 1.27f, 0.003f)),
      (2L, Seq(0.0f, 0.0f)), // zero vector: scale 0, all-zero quant
      (3L, Seq(-0.004f))).toDF("id", "v")
    val out = df
      .withColumn("scale", Embeddings.int8Scale(col("v")))
      .withColumn("q", Embeddings.quantizeInt8(col("v"), col("scale")))
      .withColumn("err", Embeddings.maxAbsError(col("v"), col("q"), col("scale")))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("scale"), r.getSeq[Int](r.fieldIndex("q")), r.getAs[Double]("err")))).toMap
    val (s1, q1, e1) = out(1L)
    assert(math.abs(s1 - 1.27 / 127) < 1e-6)
    assert(q1.head == 50 && q1(1) == -127 && q1(2) == 127, q1)
    assert(e1 <= s1 / 2 + 1e-9, s"err $e1 > scale/2 ${s1 / 2}")
    val (s2, q2, e2) = out(2L)
    assert(s2 == 0.0 && q2.forall(_ == 0) && e2 == 0.0)
    val (s3, q3, _) = out(3L)
    assert(q3.head == -127, s"single-component vector quantizes to ±127, got $q3 (scale $s3)")
  }

  test("groupCentroids: exact per-dimension means, dim order preserved") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f)),
      (1, Seq(3.0f, 6.0f)),
      (2, Seq(-1.0f, 0.5f))).toDF("label", "vec")
    val out = Embeddings.groupCentroids(df, "label", "vec").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
    assert(out(1) == ((2L, Seq(2.0, 4.0))))
    assert(out(2) == ((1L, Seq(-1.0, 0.5))))
  }
}

class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  // 4-dp-representable deterministic vectors: dim 8, m=2 subspaces
  private def corpus(n: Int) =
    (0L until n.toLong)
      .map(i => (i, (0 until 8).map(d => ((i * 7 + d * 3) % 20).toFloat / 10.0f)))
      .toDF("id", "v")

  test("pq is lossless when every vector seeds its own centroid (k = n)") {
    val df = corpus(4)
    val books = ProductQuant.pqFit(df, "id", "v", m = 2, k = 4, iters = 1)
    assert(books.length == 2 && books.forall(_.nonEmpty))
    val out = ProductQuant.pqEncode(df, "id", "v", books, k = 4).collect()
    assert(out.length == 4)
    // every subvector is exactly a centroid -> zero reconstruction error
    out.foreach(r => assert(r.getDouble(2) == 0.0, s"recon ${r.getDouble(2)} for id ${r.getLong(0)}"))
    // packed codes decode to valid digits and are distinct for distinct vectors
    val codes = out.map(_.getLong(1))
    assert(codes.forall(c => c >= 0 && c < 16)) // k^m = 16
    assert(codes.distinct.length == codes.length)
  }

  test("pq training is deterministic and a Lloyd round does not worsen total distortion") {
    val df = corpus(24)
    val b1 = ProductQuant.pqFit(df, "id", "v", m = 2, k = 4, iters = 1)
    val b2 = ProductQuant.pqFit(df, "id", "v", m = 2, k = 4, iters = 1)
    assert(b1 == b2, "pqFit must be bit-deterministic across runs")
    val b0 = ProductQuant.pqFit(df, "id", "v", m = 2, k = 4, iters = 0)
    def totalErr(books: Seq[ProductQuant.Codebook]): Double =
      ProductQuant.pqEncode(df, "id", "v", books, k = 4)
        .agg(org.apache.spark.sql.functions.sum("recon_d2")).head().getDouble(0)
    // 4-dp centroid rounding can cost at most ~dim*(1e-4)^2 per vector
    assert(totalErr(b1) <= totalErr(b0) + 1e-4,
      s"refined ${totalErr(b1)} vs seed ${totalErr(b0)}")
  }

  test("ivf-pq with lossless residual codebooks reproduces exact dot products over all lists") {
    val df = corpus(4)
    val vecs = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .toMap
    val q = vecs(1L)
    // nprobe = nlist: every list probed; k = n: every residual is its
    // own centroid, so ADC scores are the exact dot products
    val out = ProductQuant
      .ivfAdcTopK(df, "id", "v", nlist = 2, m = 2, k = 4, nprobe = 2,
        queries = Seq((1L, q)), topK = 4)
      .collect()
      .map(r => r.getLong(1) -> r.getDouble(2))
      .toMap
    assert(out.keySet == vecs.keySet)
    vecs.foreach { case (id, v) =>
      val exact = q.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(out(id) - exact) < 1e-3, s"id $id adc ${out(id)} vs exact $exact")
    }
  }

  test("ivf-pq probes only nprobe lists and is deterministic") {
    val df = corpus(24)
    val q = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .toMap.apply(0L)
    def run() = ProductQuant
      .ivfAdcTopK(df, "id", "v", nlist = 4, m = 2, k = 4, nprobe = 1,
        queries = Seq((0L, q)), topK = 24)
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
      .toSeq
    val a = run()
    val b = run()
    assert(a == b, "ivfAdcTopK must be deterministic across runs")
    // nprobe=1 of 4 lists: the probe must return a strict subset of the corpus
    assert(a.nonEmpty && a.length < 24, s"expected a strict subset, got ${a.length} rows")
  }

  test("adc scoring stays correct when an empty cluster drops (non-dense codebook ids)") {
    // v0 and v1 share their subspace-0 half: at k = n the duplicate seed's
    // cluster wins no members (ties go to the lowest id) and is DROPPED,
    // leaving non-dense codebook ids — the LUT must index by centroid id,
    // not list position
    val vecs = Seq(
      (0L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Seq(1.0f, 2.0f, 9.0f, 9.0f)),
      (2L, Seq(5.0f, 5.0f, 1.0f, 1.0f)),
      (3L, Seq(7.0f, 1.0f, 2.0f, 8.0f)))
    val df = vecs.toDF("id", "v")
    val books = ProductQuant.pqFit(df, "id", "v", m = 2, k = 4, iters = 1)
    assert(books(0).size < 4, s"expected a dropped cluster, got ids ${books(0).map(_._1)}")
    val enc = ProductQuant.pqEncode(df, "id", "v", books, 4)
    enc.collect().foreach(r =>
      assert(r.getDouble(2) == 0.0, s"recon must be exact, got ${r.getDouble(2)}"))
    val q = Seq(0.5, -1.0, 2.0, 0.25)
    val out = ProductQuant.adcTopK(enc, "id", books, 4, Seq((9L, q)), 4)
      .collect()
      .map(r => r.getLong(1) -> r.getDouble(2))
      .toMap
    vecs.foreach { case (id, v) =>
      val exact = q.zip(v.map(_.toDouble)).map { case (a, b) => a * b }.sum
      assert(math.abs(out(id) - exact) < 1e-3, s"id $id: adc ${out(id)} vs exact $exact")
    }
  }

  test("lossy-codebook ADC reaches recall@10 >= 0.9 against exact dot-product top-k") {
    // The lossless-parity tests above pin ADC's arithmetic at k = n;
    // this anchors the APPROXIMATION quality on a genuinely lossy
    // configuration (k << n, positive reconstruction error) — the same
    // role the subset-of-brute-top-k' pin plays for hyperplane ANN.
    // Corpus: 10 deterministic cluster centers in [0,1]^8 with per-
    // vector jitter (embedding-like geometry; a hash in place of RNG
    // keeps the spec bit-reproducible).
    val n = 200
    // splitmix-style avalanche: a plain LCG here leaves consecutive
    // cluster centers nearly collinear (inter-center cos > 0.99) and the
    // recall anchor would measure hash artifacts, not ADC quality
    def mix(x0: Long): Long = {
      var x = x0
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33; x
    }
    def h(i: Long, d: Int, salt: Int): Double =
      java.lang.Long.remainderUnsigned(mix(i * 1000003L + d * 8191L + salt), 1000L) / 1000.0
    // 20 directionally-separated clusters of 10 members each, all
    // UNIT-NORMALIZED: dot-product ranking is then cosine ranking, a
    // query's exact top-10 is its own cluster, and the anchor measures
    // whether ADC preserves cluster-level ranking (what PQ is for)
    // rather than norm effects or within-jitter noise
    val vecs = (0L until n.toLong).map { i =>
      val c = (i % 20).toInt
      val raw = (0 until 8).map(d => h(c.toLong, d, 7) - 0.5 + 0.05 * h(i, d, 13))
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i, raw.map(x => (x / norm).toFloat))
    }
    val df = vecs.toDF("id", "v")
    val books = ProductQuant.pqFit(df, "id", "v", m = 4, k = 32, iters = 2)
    val enc = ProductQuant.pqEncode(df, "id", "v", books, k = 32)
    // genuinely lossy: 16 centroids cannot represent 200 subvectors
    val totalErr = enc.agg(org.apache.spark.sql.functions.sum("recon_d2")).head().getDouble(0)
    assert(totalErr > 0.0, "configuration must be lossy for the recall bound to mean anything")
    val queries = Seq(3L, 77L, 150L).map(q => q -> vecs(q.toInt)._2.map(_.toDouble).toSeq)
    val recalls = queries.map { case (qid, q) =>
      val exactTop = vecs
        .map { case (id, v) => id -> v.map(_.toDouble).zip(q).map(p => p._1 * p._2).sum }
        .sortBy { case (id, s) => (-s, id) }
        .take(10).map(_._1).toSet
      val adcTop = ProductQuant.adcTopK(enc, "id", books, 32, Seq((qid, q)), 10)
        .collect().map(_.getLong(1)).toSet
      (exactTop & adcTop).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"recall@10 per query = $recalls (mean $mean)")
  }

  test("adc over a lossless codebook reproduces exact dot products") {
    val df = corpus(4)
    val books = ProductQuant.pqFit(df, "id", "v", m = 2, k = 4, iters = 1)
    val encoded = ProductQuant.pqEncode(df, "id", "v", books, k = 4)
    val vecs = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .toMap
    val q = vecs(0L)
    val out = ProductQuant
      .adcTopK(encoded, "id", books, k = 4, queries = Seq((0L, q)), topK = 4)
      .collect()
      .map(r => r.getLong(1) -> r.getDouble(2))
      .toMap
    vecs.foreach { case (id, v) =>
      val exact = q.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(out(id) - exact) < 1e-3, s"id $id adc ${out(id)} vs exact $exact")
    }
  }
}

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigramNll matches a hand-computed add-k score on a 2-doc corpus") {
    // corpus: "a b a b" and "a b c": bigrams ab,ba,ab | ab,bc
    // counts: c(a)=3 c(b)=3 c(c)=1, V=3; c(ab)=3 c(ba)=1 c(bc)=1, k=0.5
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = LanguageModel.bigramNll(df, "doc_id", "text", 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def p(c12: Double, c1: Double) = -math.log((c12 + 0.5) / (c1 + 0.5 * 3))
    val d1 = (p(3, 3) + p(1, 3) + p(3, 3)) / 3
    val d2 = (p(3, 3) + p(1, 3)) / 2
    assert(out(1L)._1 == 3 && math.abs(out(1L)._2 - d1) < 5e-5, s"${out(1L)} vs $d1")
    assert(out(2L)._1 == 2 && math.abs(out(2L)._2 - d2) < 5e-5, s"${out(2L)} vs $d2")
  }

  test("single-token and empty docs are excluded; common phrasing scores lower than rare") {
    val df = Seq(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat sat"),
      (4L, "zqv cat blorp"), (5L, "solo"), (6L, " ")).toDF("doc_id", "text")
    val out = LanguageModel.bigramNll(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!out.contains(5L) && !out.contains(6L))
    assert(out(1L) < out(4L), s"common ${out(1L)} should score below rare ${out(4L)}")
  }
}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpe merges the most frequent pair first with deterministic tie-breaks") {
    // word types: "aaab" x3, "aab" x2; pair counting runs over ALL
    // adjacent positions, so "aaab" contributes (a,a) twice:
    // (a,a) = 2*3 + 1*2 = 8 beats (a,b) = 5.
    val docs = Seq(
      (1L, "aaab aaab"),
      (2L, "aaab aab"),
      (3L, "aab")).toDF("id", "text")
    val rules = Bpe.fit(docs, "text", merges = 2)
    assert(rules.head.lhs == "a" && rules.head.rhs == "a", rules)
    assert(rules.head.pairCount == 8L, rules)
    // after merging (a,a): "aaab" -> [aa, a, b], "aab" -> [aa, b]
    // round-2 pairs: (aa,a)=3, (a,b)=3, (aa,b)=2 -> tie on 3 broken
    // lexicographically: (a,b) < (aa,a)  (binary order: "a" < "aa")
    assert(rules(1).lhs == "a" && rules(1).rhs == "b", rules)
    assert(rules(1).pairCount == 3L, rules)
  }

  test("bpe encodeCounts applies rules in order over word types and joins counts back") {
    val docs = Seq(
      (1L, "aaab aab"),
      (2L, "aaab aaab"),
      (3L, "")).toDF("id", "text")
    val rules = Bpe.fit(docs, "text", merges = 2) // (a,a) then (a,b)
    // "aaab" -> [aa,a,b] -> [aa,ab] (2 subwords); "aab" -> [aa,b] (2)
    val out = Bpe.encodeCounts(docs, "id", "text", rules)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((2L, 4L, 2.0)), out(1L))
    assert(out(2L) == ((2L, 4L, 2.0)), out(2L))
    assert(out(3L) == ((0L, 0L, 0.0)), s"empty doc: ${out(3L)}")
  }

  test("bpe leftmost-greedy merge handles overlapping runs and stops when exhausted") {
    // single word type "aaaa": round 1 (a,a)=3 -> merge -> [aa, aa]
    // round 2 (aa,aa)=1 -> merge -> [aaaa]; round 3: no pairs left
    val docs = Seq((1L, "aaaa")).toDF("id", "text")
    val rules = Bpe.fit(docs, "text", merges = 5)
    assert(rules.map(r => (r.lhs, r.rhs, r.pairCount)) ==
      Seq(("a", "a", 3L), ("aa", "aa", 1L)), rules)
  }

  test("bpe driver-side and engine fit paths produce identical rules") {
    // overlapping runs, count ties broken on lhs then rhs, multi-char
    // winners in later rounds, a word that exhausts, and a multi-byte
    // (2-byte UTF-8) symbol competing in a tie — everything the two
    // paths must agree on, rule for rule
    val docs = Seq(
      (1L, "aaab aaab xy"),
      (2L, "aab xy bé"),
      (3L, "bé bé aaaa"),
      (4L, "z")).toDF("id", "text")
    for (m <- Seq(1, 2, 3, 8)) {
      val engine = Bpe.fit(docs, "text", merges = m, driverFitCap = -1L)
      val driver = Bpe.fit(docs, "text", merges = m) // under the cap -> local
      assert(engine == driver, s"merges=$m: engine $engine vs driver $driver")
    }
  }
}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunking covers every token, honors overlap, and never emits a subset chunk") {
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, "short doc"), (3L, " ")).toDF("id", "text")
    val out = TextAnalysis.chunkDocuments(df, "id", "text", 64, 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(!out.exists(_._1 == 3L), "blank doc must produce no chunks")
    val short = out.filter(_._1 == 2L)
    assert(short.length == 1 && short.head._3 == 2 && short.head._4 == "short doc")
    val long = out.filter(_._1 == 1L).sortBy(_._2)
    // 150 tokens, chunk 64, stride 48 -> chunks at 1, 49, 97 (covers 97..150)
    assert(long.length == 3, long.map(_._2).toSeq)
    assert(long.head._4.startsWith("t1 ") && long.head._3 == 64)
    assert(long(1)._4.startsWith("t49 "), "stride must be chunk - overlap")
    assert(long(2)._4.endsWith(" t150"), "last chunk must reach the document end")
    // overlap: chunk k's first 16 tokens == chunk k-1's last 16
    val c0 = long.head._4.split(" ")
    val c1 = long(1)._4.split(" ")
    assert(c0.takeRight(16).toSeq == c1.take(16).toSeq)
  }
}

class CanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalPerCluster picks the best score, ties to lowest id, counts members") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val scored = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.4), // chain cluster rep=1: best is 2
      (10L, 0.7), (11L, 0.7)) // tie: lowest id 10 wins
      .toDF("doc_id", "score")
    val out = Dedup.canonicalPerCluster(pairs, scored, "doc_id", "score").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 3L, 0.9)), out)
    assert(out(10L) == ((10L, 2L, 0.7)), out)
  }
}
