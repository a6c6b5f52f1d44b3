package graft.expressions

import graft.SparkTestBase
import graft.ops.DedupOps
import org.apache.spark.sql.functions._

class SignaturesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfTiny/documents.parquet")

  test("minhash_signature expression equals the HOF formulation exactly") {
    SignatureFunctions.register(spark)
    val staged = docs.limit(50)
      .withColumn("toks", DedupOps.tokens($"text"))
      .withColumn("sh", DedupOps.shingles($"toks"))
      .withColumn("hs", array_distinct(transform($"sh",
        s => pmod(xxhash64(s), lit(2147483647L)))))
    val diff = staged
      .withColumn("fast", call_function("minhash_signature", $"hs"))
      .withColumn("ref", DedupOps.signatureFromHashesHof($"hs"))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0)
  }

  test("sig_match_count (estJaccard kernel) equals the HOF zip_with " +
    "formulation exactly, real signatures and edge shapes") {
    SignatureFunctions.register(spark)
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / DedupOps.NumHashes
    // real signatures: every adjacent-id pair of the corpus's frames
    val sigs = docs.limit(60)
      .withColumn("toks", DedupOps.tokens($"text"))
      .withColumn("hs", array_distinct(transform(
        DedupOps.shingles($"toks"),
        s => pmod(xxhash64(s), lit(2147483647L)))))
      .withColumn("sig", call_function("minhash_signature", $"hs"))
      .select($"doc_id", $"sig")
    val pairs = sigs.as("x").join(sigs.as("y"),
      col("x.doc_id") + 1 === col("y.doc_id"))
      .select(col("x.sig").as("a"), col("y.sig").as("b"))
    val diff = pairs
      .withColumn("fast", DedupOps.estJaccard($"a", $"b"))
      .withColumn("ref", hof($"a", $"b"))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0)
    // edge shapes: identical, disjoint, single-element, length mismatch
    // (zip_with's null padding contributed 0 — the kernel counts only
    // the shared prefix, same value)
    val edges = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(7L), Seq(7L)),
      (Seq(1L, 2L), Seq(1L, 2L, 99L))).toDF("a", "b")
    val ediff = edges
      .withColumn("fast", DedupOps.estJaccard($"a", $"b"))
      .withColumn("ref", hof($"a", $"b"))
      .filter($"fast" =!= $"ref").count()
    assert(ediff == 0)
  }

  test("min_gram_md5 equals the HOF md5-per-window formulation exactly") {
    import graft.ops.TextAnalysisOps
    val staged = docs
      .withColumn("norm", TextAnalysisOps.normalized($"text"))
    val diff = staged
      .withColumn("fast", TextAnalysisOps.minGramMd5FromNorm($"norm"))
      .withColumn("ref", TextAnalysisOps.minGramMd5FromNormHof($"norm"))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0)
    // edge shapes the corpus may not cover: shorter-than-k (whole-text
    // md5), exactly k, multi-byte codepoints straddling windows, empty
    val edges = Seq("", "short", "exactly8", "héllo wörld ünïcode ß",
      "ab", "aaaaaaaaaa").toDF("norm")
    val ediff = edges
      .withColumn("fast", TextAnalysisOps.minGramMd5FromNorm($"norm"))
      .withColumn("ref", TextAnalysisOps.minGramMd5FromNormHof($"norm"))
      .filter($"fast" =!= $"ref" ||
        ($"fast".isNull =!= $"ref".isNull)).count()
    assert(ediff == 0)
  }

  test("simhash64 expression equals the HOF formulation exactly") {
    SignatureFunctions.register(spark)
    val staged = docs.limit(50)
      .withColumn("toks", DedupOps.tokens($"text"))
      .withColumn("hs", transform($"toks", t => xxhash64(t)))
    val diff = staged
      .withColumn("fast", call_function("simhash64", $"hs"))
      .withColumn("ref", DedupOps.simhashFromHashes($"hs"))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0)
  }

  test("lsh_sign expression equals the HOF plane-dot formulation exactly") {
    val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")
    val diff = emb
      .withColumn("fast", graft.ops.SimilarityOps.lshSignature($"embedding", 64))
      .withColumn("ref", graft.ops.SimilarityOps.lshSignatureHof($"embedding", 64))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0)
  }

  test("rademacher_project equals a driver-side reference; projection " +
    "roughly preserves cosine neighborhoods (JL sanity)") {
    import graft.ops.SimilarityOps
    val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(200)
    val dim = 64
    val outDim = 16
    val signs = SimilarityOps.rademacherSigns(dim, outDim)
    val got = SimilarityOps.randomProject(emb, outDim, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // driver-side reference: quantize half-away, ±sums per row
    def quant(x: Double): Long = {
      val s = x * 1e6
      if (s >= 0) math.floor(s + 0.5).toLong else math.ceil(s - 0.5).toLong
    }
    val want = emb.collect().map { r =>
      val v = r.getSeq[Float](1).map(f => quant(f.toDouble))
      r.getLong(0) -> (0 until outDim).map { j =>
        (0 until dim).map(i => signs(j * dim + i) * v(i)).sum
      }
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) => assert(got(id) == w, s"vec $id") }
    // JL sanity: projected cosine correlates with full-dim cosine —
    // high-similarity pairs stay high, dissimilar pairs stay low,
    // ON AVERAGE (JL bounds distortion per pair only probabilistically
    // at this outDim; the mean gap is the stable signal)
    val rows = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val proj = rows.map { case (id, _) => id -> got(id).map(_.toDouble) }.toMap
    val pairs = for {
      (ai, av) <- rows.take(40); (bi, bv) <- rows.take(40) if ai < bi
    } yield (cos(av, bv), cos(proj(ai), proj(bi)))
    val byFull = pairs.sortBy(_._1)
    val dec = math.max(1, byFull.length / 10)
    val lo = byFull.take(dec).map(_._2)
    val hi = byFull.takeRight(dec).map(_._2)
    assert(hi.sum / hi.size > lo.sum / lo.size + 0.25,
      s"projection must separate the most-similar decile from the " +
        s"least-similar on average: hi=${hi.sum / hi.size} " +
        s"lo=${lo.sum / lo.size}")
  }

  test("sign generators survive the xorshift absorbing-zero seed") {
    // the one seed whose XOR-mix lands on state 0 used to emit 0 forever:
    // every Rademacher sign +1 (projection collapses to one direction)
    // and every LSH plane all-zero (every sign bit 0)
    val degenerate = 0x9e3779b97f4a7c15L
    val signs = graft.ops.SimilarityOps.rademacherSigns(8, 4, degenerate)
    assert(signs.contains(1.toByte) && signs.contains(-1.toByte),
      "degenerate seed must still produce a mixed sign matrix")
    val qp = graft.ops.SimilarityOps.quantizedPlanes(8, 16, degenerate)
    assert(qp.flatten.exists(_ != 0L),
      "degenerate seed must still produce nonzero hyperplanes")
  }

  test("word_gram_hashes equals the shingle+hash HOF chain on real docs") {
    val staged = docs.withColumn("toks", DedupOps.tokens($"text"))
    // sort both sides: the expression emits first-occurrence order like
    // array_distinct, but only SET equality is contracted
    Seq(2, 3, 5).foreach { w =>
      val diffPlain = staged
        .withColumn("fast", array_sort(DedupOps.gramHashes($"toks", w)))
        .withColumn("ref", array_sort(array_distinct(
          transform(DedupOps.shingles($"toks", w), s => xxhash64(s)))))
        .filter($"fast" =!= $"ref").count()
      assert(diffPlain == 0, s"w=$w plain")
      val diffPrime = staged
        .withColumn("fast",
          array_sort(DedupOps.gramHashes($"toks", w, modPrime = true)))
        .withColumn("ref", array_sort(array_distinct(
          transform(DedupOps.shingles($"toks", w),
            s => pmod(xxhash64(s), lit(2147483647L))))))
        .filter($"fast" =!= $"ref").count()
      assert(diffPrime == 0, s"w=$w modPrime")
    }
  }

  test("word_gram_md5_hashes equals the md5 HOF chain on real docs " +
    "(incl. short-doc fallback)") {
    def kernel(toks: org.apache.spark.sql.Column, w: Int): org.apache.spark.sql.Column =
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.expressions.WordGramMd5Hashes(
          org.apache.spark.sql.GraftColumnBridge.expression(toks), w))
    def ref(toks: org.apache.spark.sql.Column, w: Int): org.apache.spark.sql.Column =
      array_distinct(transform(DedupOps.shingles(toks, w), g =>
        pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"),
          lit(graft.expressions.SignatureParams.Prime))))
    val staged = docs.withColumn("toks", DedupOps.tokens($"text"))
    Seq(2, 3).foreach { w =>
      val diff = staged
        .withColumn("fast", array_sort(kernel($"toks", w)))
        .withColumn("slow", array_sort(ref($"toks", w)))
        .filter($"fast" =!= $"slow").count()
      assert(diff == 0, s"w=$w")
    }
    // degenerate shapes: whole-text fallback, empty array, repeated gram
    val edge = Seq((1, Seq("a", "b")), (2, Seq[String]()),
      (3, Seq("x", "x", "x", "x"))).toDF("id", "toks")
    val diffE = edge
      .withColumn("fast", array_sort(kernel($"toks", 3)))
      .withColumn("slow", array_sort(ref($"toks", 3)))
      .filter($"fast" =!= $"slow").count()
    assert(diffE == 0)
  }

  test("token_hashes equals the transform+xxhash64 HOF on real docs") {
    val staged = docs.withColumn("toks", DedupOps.tokens($"text"))
    val diff = staged
      .withColumn("fast", DedupOps.tokenHashes($"toks"))
      .withColumn("ref", transform($"toks", t => xxhash64(t)))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0)
    // duplicates preserved in order, empty array passes through
    val edge = Seq((1, Seq("a", "a", "b")), (2, Seq[String]())).toDF("id", "toks")
    val rows = edge.withColumn("h", DedupOps.tokenHashes($"toks"))
      .orderBy("id").select("h").collect()
    val h0 = rows(0).getSeq[Long](0)
    assert(h0.length == 3 && h0(0) == h0(1) && h0(0) != h0(2))
    assert(rows(1).getSeq[Long](0).isEmpty)
  }

  test("word_gram_hashes degenerate inputs: short docs, empty array") {
    val df = Seq(
      (1, Seq("a", "b")),      // shorter than w=3 -> whole-text fallback
      (2, Seq[String]()),      // empty -> hash of ""
      (3, Seq("x", "x", "x", "x")) // repeated gram -> one distinct hash
    ).toDF("id", "toks")
    val got = df
      .withColumn("fast", array_sort(DedupOps.gramHashes($"toks", 3)))
      .withColumn("ref", array_sort(array_distinct(
        transform(DedupOps.shingles($"toks", 3), s => xxhash64(s)))))
      .filter($"fast" =!= $"ref").count()
    assert(got == 0)
    val rep = df.filter($"id" === 3)
      .select(size(DedupOps.gramHashes($"toks", 3))).head().getInt(0)
    assert(rep == 1)
  }

  test("stopword_hits equals the interpreted HOF formulation on real docs") {
    import graft.ops.TextAnalysisOps
    val staged = docs.withColumn("toks", DedupOps.tokens($"text"))
    TextAnalysisOps.Langs.foreach { lang =>
      val sw = array(TextAnalysisOps.Stopwords(lang).map(lit): _*)
      val diff = staged
        .withColumn("fast", TextAnalysisOps.stopwordHits($"toks",
          TextAnalysisOps.Stopwords(lang)))
        .withColumn("ref", size(filter($"toks", t => array_contains(sw, t))))
        .filter($"fast" =!= $"ref").count()
      assert(diff == 0, lang)
    }
  }

  test("stopword_hits edge cases: empty array, null array, null elements") {
    val en = graft.ops.TextAnalysisOps.Stopwords("en")
    val df = Seq(
      (1, Seq[String]()),
      (2, null),
      (3, Seq("the", null, "the", "xyzzy"))
    ).toDF("id", "toks")
    val got = df.withColumn("n", graft.ops.TextAnalysisOps.stopwordHits($"toks", en))
      .orderBy("id").select("n").collect()
    assert(got(0).getInt(0) == 0)
    assert(got(1).isNullAt(0))
    assert(got(2).getInt(0) == 2) // occurrences, null elements skipped
  }

  test("SQL registry forms of the r5 expressions work with literal params") {
    SignatureFunctions.register(spark)
    val r = spark.sql(
      """SELECT word_gram_hashes(array('a','b','c','d'), 3) AS wg,
        |       word_gram_hashes(array('a','b','c','d'), 3, true) AS wgp,
        |       token_hashes(array('a','a')) AS th,
        |       stopword_hits(array('the','fox','the'), array('the','a')) AS sw
        |""".stripMargin).head()
    assert(r.getSeq[Long](0).length == 2) // "a b c", "b c d"
    assert(r.getSeq[Long](1).forall(h => h >= 0 && h < 2147483647L))
    val th = r.getSeq[Long](2)
    assert(th.length == 2 && th(0) == th(1))
    assert(r.getInt(3) == 2)
  }

  test("empty input arrays behave sanely") {
    SignatureFunctions.register(spark)
    val r = spark.sql(
      """SELECT minhash_signature(CAST(array() AS ARRAY<BIGINT>)) mh,
        |       simhash64(CAST(array() AS ARRAY<BIGINT>)) sh""".stripMargin).head()
    assert(r.getSeq[Long](0).forall(_ == 2147483647L)) // empty set -> Prime
    assert(r.getLong(1) == 0L) // no votes -> all bits 0
  }
}
