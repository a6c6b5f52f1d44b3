package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Differential coverage for the FLOAT side of the bigram LM
  * (avg_nll / ppl / filterByNll): the integer sufficient statistics are
  * hash-pinned under the DuckDB oracle (`lm_train`/`lm_score`); here the
  * derived cross-entropy is recomputed by an independent driver-side
  * walk with the same tokenization and add-one smoothing, and the only
  * user-facing filter entry point is round-tripped. */
class LmSpec extends SparkTestBase {
  import spark.implicits._

  private val trainText = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "a cat and a dog"),
    (4L, "the cat saw the dog"))
  private val scoreText = Seq(
    (10L, "the cat sat"),            // all bigrams seen in training
    (11L, "the zebra sat on a mat"), // OOV token + unseen histories
    (12L, "dog"),                    // one token: zero bigrams
    (13L, ""),                       // no tokens at all
    (14L, "the dog sat on the mat and the cat"))

  private def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  // ---- independent oracle: same regex, same smoothing, plain Scala ----
  private def toks(s: String): Seq[String] =
    "[a-z]+".r.findAllIn(s.toLowerCase).toSeq
  private def pairs(ts: Seq[String]): Seq[(String, String)] =
    if (ts.size < 2) Nil else ts.zip(ts.tail)

  private lazy val c2: Map[(String, String), Long] =
    trainText.flatMap(t => pairs(toks(t._2)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  private lazy val c1: Map[String, Long] =
    c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
  private lazy val vocab: Long =
    trainText.flatMap(t => toks(t._2)).distinct.size.toLong

  private def oracleNll(text: String): Option[Double] = {
    val bg = pairs(toks(text))
    if (bg.isEmpty) None
    else Some(bg.map { case (w1, w2) =>
      val num = c2.getOrElse((w1, w2), 0L) + 1.0
      val den = c1.getOrElse(w1, 0L) + vocab.toDouble
      -(math.log(num) - math.log(den))
    }.sum / bg.size)
  }

  private lazy val model = LmOps.trainBigram(df(trainText))

  test("trained model satisfies the c1 = sum(c2) identity and exact vocab") {
    assert(model.vocab == vocab)
    val gotC2 = model.bigrams.as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(gotC2 == c2)
    val gotC1 = model.unigrams.as[(String, Long)].collect().toMap
    assert(gotC1 == c1)
  }

  test("avg_nll and ppl match an independent recomputation per document") {
    val got = LmOps.scoreDocs(df(scoreText), model)
      .select($"doc_id", $"avg_nll", $"ppl")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(got.keySet == scoreText.map(_._1).toSet,
      "one score row per input doc, bigram-less docs included")
    scoreText.foreach { case (id, text) =>
      val (nll, ppl) = got(id)
      (oracleNll(text), nll) match {
        case (None, None) => // no bigrams: null cross-entropy — correct
        case (Some(w), Some(g)) =>
          assert(math.abs(w - g) < 1e-9, s"doc $id: want $w got $g")
          assert(math.abs(ppl.get - math.exp(g)) < 1e-9,
            s"doc $id: ppl must be exp(avg_nll)")
        case other => fail(s"doc $id: null-ness mismatch $other")
      }
    }
  }

  test("an unseen history scores exactly log(V) per bigram") {
    // "zz qq": neither bigram nor history in training => P = 1/V
    val got = LmOps.scoreDocs(Seq((99L, "zz qq")).toDF("doc_id", "text"), model)
      .select("avg_nll").as[Double].head()
    assert(math.abs(got - math.log(vocab.toDouble)) < 1e-9)
  }

  test("filterByNll keeps exactly the at-or-below-threshold docs and drops unscorable ones") {
    val scored = LmOps.scoreDocs(df(scoreText), model)
      .select($"doc_id", $"avg_nll").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    // threshold between the best and worst finite scores so both sides
    // of the cut are non-empty
    val finite = scored.values.flatten.toSeq.sorted
    assert(finite.size >= 3)
    val cut = (finite.head + finite.last) / 2
    val want = scored.collect {
      case (id, Some(n)) if n <= cut => id
    }.toSet
    val kept = LmOps.filterByNll(df(scoreText), model, cut)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == want)
    assert(want.nonEmpty && (scored.keySet -- want).nonEmpty)
    assert(!kept.contains(12L) && !kept.contains(13L),
      "docs with no bigrams carry no evidence and must be dropped")
    // kept rows are the ORIGINAL rows (left_semi keeps schema + values)
    val row = LmOps.filterByNll(df(scoreText), model, cut)
      .filter($"doc_id" === 10L).select("text").as[String].head()
    assert(row == "the cat sat")
  }
}
