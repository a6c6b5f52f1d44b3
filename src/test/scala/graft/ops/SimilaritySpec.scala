package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")

  test("semanticContamination: threshold, argmax, and min-id tie-break") {
    // corpus doc 1 ≡ test 10 and test 20 exactly (tie → min test id);
    // doc 2 is orthogonal to every test row (below threshold, absent)
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val tests = Seq(
      (20L, Seq(1f, 0f, 0f)),
      (10L, Seq(1f, 0f, 0f)),
      (30L, Seq(0f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.semanticContamination(corpus, tests, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 10L, 1.0)),
      s"expected doc 1 flagged against test 10 only, got ${got.toSeq}")
  }

  test("cosine expression matches a driver-side computation") {
    val rows = emb.orderBy("vec_id").limit(2).collect()
    val (v1, v2) = (rows(0).getSeq[Float](1), rows(1).getSeq[Float](1))
    def cosRef(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val got = emb.as("a").filter($"vec_id" === rows(0).getLong(0))
      .crossJoin(emb.as("b").filter($"vec_id" === rows(1).getLong(0)))
      .select(SimilarityOps.cosine($"a.embedding", $"b.embedding"))
      .head().getDouble(0)
    assert(math.abs(got - cosRef(v1, v2)) < 1e-9)
  }

  test("brute-force top-k agrees exactly with a driver-side computation") {
    val all = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until a.length).foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = emb.filter($"vec_id" % 50 === 0)
    val got = SimilarityOps.bruteForceTopK(queries, emb, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val qids = all.keys.filter(_ % 50 == 0)
    qids.foreach { q =>
      val want = all.keys.filter(_ != q).toSeq
        .map(i => (BigDecimal(cos(all(q), all(i))).setScale(4, BigDecimal.RoundingMode.HALF_UP), i))
        .sortBy { case (c, i) => (-c, i) }.take(10).map(_._2)
      val gotIds = (1 to 10).map(r => got((q, r)))
      assert(gotIds == want, s"query $q")
    }
  }

  test("LSH top-k has high recall on clustered data (the ANN use case)") {
    // plant 10 well-separated clusters: center + small noise
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" % 30 === 0)
    val brute = SimilarityOps.bruteForceTopK(queries, df, k = 10)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.lshTopK(queries, df, k = 10, dim = 64)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall@10 = $recall")
    info(s"clustered LSH recall@10 = $recall")
  }

  test("LSH top-k on unstructured data still finds a usable fraction") {
    val queries = emb.filter($"vec_id" % 50 === 0)
    val brute = SimilarityOps.bruteForceTopK(queries, emb, k = 10)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.lshTopK(queries, emb, k = 10, dim = 64)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // random 64-dim vectors: banding theory predicts ~0.4 here; this is the
    // worst case for LSH and the reason the brute path stays the baseline
    assert(recall >= 0.25, s"recall@10 = $recall")
    info(s"random-data LSH recall@10 = $recall")
  }

  test("IVF top-k has high recall on clustered data") {
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" % 30 === 0)
    val brute = SimilarityOps.bruteForceTopK(queries, df, k = 10)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(queries, df, k = 10, nlist = 16, nprobe = 4)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // nprobe=4 of nlist=16 cells; clustered data concentrates true
    // neighbours in the probed cells
    assert(recall >= 0.8, s"recall@10 = $recall")
    info(s"clustered IVF recall@10 = $recall")
  }

  test("IVF top-k on unstructured data degrades gracefully") {
    val queries = emb.filter($"vec_id" % 50 === 0)
    val brute = SimilarityOps.bruteForceTopK(queries, emb, k = 10)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(queries, emb, k = 10, nlist = 8, nprobe = 4)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // random vectors have no cell structure; probing half the cells
    // should still catch a usable fraction of true neighbours
    assert(recall >= 0.3, s"recall@10 = $recall")
    info(s"random-data IVF recall@10 = $recall")
  }

  test("IVF with pre-built centroids equals the inline-build path") {
    // the amortized-serving shape: ivfCentroids once, fed back per batch —
    // must be bit-identical to ivfTopK's inline build (same centroid
    // arithmetic, same probe/re-rank), only the Lloyd's pass is saved
    val queries = emb.filter($"vec_id" % 50 === 0)
    val inline0 = SimilarityOps.ivfTopK(queries, emb, k = 10, nlist = 8,
      nprobe = 4, iters = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val cents = SimilarityOps.ivfCentroids(emb, nlist = 8, iters = 1)
      .localCheckpoint(true) // the "persisted index" stand-in
    val cached = SimilarityOps.ivfTopKWithCentroids(queries, emb, cents,
      k = 10, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(cached.sorted.toSeq == inline0.sorted.toSeq)
  }

  test("IVF returns exactly k ranked rows per query with one cell per item") {
    val queries = emb.filter($"vec_id" % 50 === 0)
    val got = SimilarityOps.ivfTopK(queries, emb, k = 10, nlist = 8, nprobe = 4)
      .collect()
    assert(got.length == queries.count() * 10)
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to 10))
    }
  }

  test("int8 quantization preserves cosine and top-k structure") {
    val q = SimilarityOps.quantizeInt8(emb)
    // cosine(original, dequantized) stays essentially 1 for every vector
    val worst = q.select(SimilarityOps.cosineFast(spark, $"embedding",
        SimilarityOps.dequantize($"embedding_q", $"embedding_scale")).as("c"))
      .agg(min("c")).head().getDouble(0)
    assert(worst >= 0.999, s"worst self-cosine after int8 round-trip: $worst")
    // top-k search over dequantized vectors finds mostly the same items
    val deq = q.select($"vec_id",
      SimilarityOps.dequantize($"embedding_q", $"embedding_scale").as("embedding"))
    val queries = emb.filter($"vec_id" % 50 === 0)
    val qq = deq.filter($"vec_id" % 50 === 0)
    val base = SimilarityOps.bruteForceTopK(queries, emb, k = 10)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = SimilarityOps.bruteForceTopK(qq, deq, k = 10)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (base & quant).size.toDouble / base.size
    assert(overlap >= 0.8, s"top-10 overlap after quantization: $overlap")
    info(f"int8 worst self-cosine $worst%.5f, top-10 overlap $overlap%.2f")
  }

  test("product quantization: idempotent codes, ADC ≡ reconstruct, usable recall") {
    val cb = SimilarityOps.pqCodebooks(emb, dim = 64)
    val codes = SimilarityOps.pqEncode(emb, cb)
    // shape: m codes per vector, every code < ksub
    val shape = codes.select(size($"codes").as("m"),
      array_max($"codes").as("mx"), array_min($"codes").as("mn"))
      .agg(min("m"), max("m"), max("mx"), min("mn")).head()
    assert(shape.getInt(0) == 8 && shape.getInt(1) == 8)
    assert(shape.getInt(2) < 16 && shape.getInt(3) >= 0)

    // decode→re-encode is a fixed point: every codeword is its own
    // nearest codeword, so the lossy cycle stabilizes after one step
    val dec = SimilarityOps.pqDecode(codes, cb)
    val re = SimilarityOps.pqEncode(dec, cb)
    val diff = codes.withColumnRenamed("codes", "c1")
      .join(re.withColumnRenamed("codes", "c2"), "vec_id")
      .filter($"c1" =!= $"c2").count()
    assert(diff == 0, s"$diff vectors changed codes on re-encode")

    // ADC scoring equals reconstruct-then-cosine (same math, different
    // association): pair sets overlap and cosines agree to the 4-decimal
    // rounding both paths apply
    val queries = emb.filter($"vec_id" % 50 === 0)
    val adc = SimilarityOps.pqTopKAdc(queries, codes, cb, k = 10)
    val rec = SimilarityOps.bruteForceTopK(queries, dec, k = 10)
    val aPairs = adc.select("query_id", "item_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rPairs = rec.select("query_id", "item_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val inter = aPairs.keySet & rPairs.keySet
    assert(inter.size.toDouble / rPairs.size >= 0.9,
      s"ADC vs reconstruct pair overlap ${inter.size}/${rPairs.size}")
    val worstGap = inter.map(k => math.abs(aPairs(k) - rPairs(k))).max
    assert(worstGap <= 1.01e-4, s"ADC vs reconstruct cos gap $worstGap")

    // recall vs the exact search: coarse 16-codeword seed codebooks
    // give a floor; Lloyd-trained codebooks must clearly beat them
    val base = SimilarityOps.bruteForceTopK(queries, emb, k = 10)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = adc.select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (base & got).size.toDouble / base.size
    assert(recall >= 0.15, s"seed-codebook PQ top-10 recall: $recall")

    val cbT = SimilarityOps.pqCodebooksTrained(emb, dim = 64, iters = 2)
    val codesT = SimilarityOps.pqEncode(emb, cbT)
    val gotT = SimilarityOps.pqTopKAdc(queries, codesT, cbT, k = 10)
      .select("query_id", "item_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallT = (base & gotT).size.toDouble / base.size
    assert(recallT >= 0.3, s"trained-codebook PQ top-10 recall: $recallT")
    assert(recallT > recall, s"training must help: $recall -> $recallT")
    info(f"PQ recall seed $recall%.2f -> trained $recallT%.2f, " +
      f"ADC/reconstruct overlap ${inter.size.toDouble / rPairs.size}%.2f, " +
      f"worst cos gap $worstGap%.1e")
  }

  test("quantized oracle twins (ann_lsh_q / ann_ivf_q): exact re-rank, usable recall") {
    // the oracle twins must stay faithful ANN shapes, not just pass the
    // hash gate: every returned cosine equals the brute-force value for
    // that pair, ranks are contiguous per query, and candidate recall vs
    // the brute-force top-10 stays usable
    val brute = graft.SparkEntry.queries("ann_topk")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    Seq("ann_lsh_q", "ann_ivf_q").foreach { name =>
      val got = graft.SparkEntry.queries(name)(spark, sfTiny)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.nonEmpty, name)
      // cosines agree with brute force wherever the pair appears there
      got.foreach { case (q, i, _, c) =>
        brute.get((q, i)).foreach(b => assert(b == c, s"$name pair ($q,$i)"))
      }
      // contiguous ranks starting at 1 per query
      got.groupBy(_._1).foreach { case (q, rows) =>
        assert(rows.map(_._3).sorted.toSeq == (1L to rows.length), s"$name query $q")
      }
      // recall of the brute-force top-10. sfTiny embeddings are
      // UNSTRUCTURED, the LSH worst case — production ann_lsh measures
      // 0.44 on this fixture (the "usable fraction" spec above), and the
      // twin lands in the same regime; IVF probes 4 of 8 cells and holds
      // a higher floor
      val bruteTop = brute.keySet
      val recall = got.map(r => (r._1, r._2)).count(bruteTop) /
        bruteTop.size.toDouble
      val floor = if (name == "ann_lsh_q") 0.3 else 0.5
      assert(recall >= floor, s"$name recall $recall")
    }
  }

  test("LSH cosine pairs: precision 1.0, subset of brute, near-dups caught") {
    val brute = SimilarityOps.cosinePairs(emb, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityOps.cosinePairsLsh(emb, 0.4, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute)) // exact re-check => precision 1.0
    assert(lsh.nonEmpty)
    // planted exact dup must always pair
    val rows = emb.limit(3).collect()
    val planted = emb.select($"vec_id", $"embedding")
      .union(Seq((99999L, rows(0).getSeq[Float](1)))
        .toDF("vec_id", "embedding"))
    val withDup = SimilarityOps.cosinePairsLsh(planted, 0.99, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withDup.contains((rows(0).getLong(0), 99999L)))
  }

  test("LSH pair banding catches planted near-dups (small perturbations)") {
    // near-exact dups: tiny noise on copies of 20 base vectors
    val rnd = new scala.util.Random(7)
    val base = Array.fill(20)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong, v.toSeq),
        (i.toLong + 1000, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat).toSeq))
    }
    val df = rows.toSeq.toDF("vec_id", "embedding")
    val got = SimilarityOps.cosinePairsLsh(df, 0.99, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = (0 until 20).count(i => got.contains((i.toLong, i.toLong + 1000)))
    assert(caught >= 18, s"caught $caught/20 planted near-dups")
  }

  test("cosinePairs is symmetric-free and thresholded") {
    val pairs = SimilarityOps.cosinePairs(emb, 0.9).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.9)
    }
  }
}
