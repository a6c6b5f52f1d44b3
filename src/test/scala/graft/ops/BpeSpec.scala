package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[BpeOps]] — the gate (bpe_merges) hash-compares two unrolled
  * training steps against DuckDB; this spec pins the algorithm itself:
  * the textbook worked example, overlapping-run replacement parity, and
  * a multi-step differential against an independent sequential
  * implementation of the same semantics. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Sequential reference: same counting (overlaps included), same
    * tie-break, same greedy left-to-right replacement — written the
    * imperative way so agreement is evidence, not tautology. */
  private def trainRef(dict: Seq[(String, Long)],
                       merges: Int): Seq[(String, String, Long, Long)] = {
    var words = dict.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(String, String, Long, Long)]
    var done = false
    var k = 0
    while (k < merges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), f) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        // apply the single merge greedily left-to-right
        words = words.map { case (syms, wf) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              nb += (a + b); i += 2
            } else { nb += syms(i); i += 1 }
          }
          (nb.result(), wf)
        }
        val tokens = words.map { case (s, f) => s.length * f }.sum
        out += ((a, b, f, tokens))
        k += 1
      }
    }
    out.result()
  }

  private def trainOn(dict: Seq[(String, Long)], merges: Int) = {
    val syms = BpeOps.initialSymbols(dict.toDF("word", "freq"))
    val (learned, st) = BpeOps.trainFromSymbols(syms, merges)
    st.unpersist()
    learned.map(m => (m.lsym, m.rsym, m.pairFreq, m.tokensAfter))
  }

  test("textbook example learns ug, un, hug") {
    val dict = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hugs", 5L))
    val got = trainOn(dict, 3)
    assert(got == Seq(
      ("u", "g", 20L, 93L),
      ("u", "n", 16L, 77L),
      ("h", "ug", 15L, 62L)))
  }

  test("overlapping runs count every adjacency but merge non-overlapping") {
    val dict = Seq(("aaaa", 3L), ("aaa", 2L))
    // (a,a) occurs 3x in aaaa and 2x in aaa -> 13 weighted; replacement
    // is greedy: aaaa -> [aa][aa], aaa -> [aa][a]
    val got = trainOn(dict, 2)
    assert(got.head == ("a", "a", 13L, 10L), got.toString)
    // step 2: (aa,aa)=3 beats (aa,a)=2
    assert(got(1) == ("aa", "aa", 3L, 7L), got.toString)
  }

  test("distributed training matches the sequential reference on real text") {
    val dict = BpeOps.wordDict(graft.queries.tDocs(spark, sfTiny), 60)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = trainRef(dict, 5)
    val got = trainOn(dict, 5)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("corpus encode joins the segmentation by broadcast, not shuffle") {
    val docs = graft.queries.tDocs(spark, sfTiny)
    val (_, syms) = BpeOps.trainFromSymbols(
      BpeOps.initialSymbols(BpeOps.wordDict(docs, 100)), 2)
    val enc = BpeOps.encodeCorpus(docs, BpeOps.segmentCounts(syms))
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"segmentation join must broadcast:\n${plan.take(1200)}")
    assert(!plan.contains("SortMergeJoin"), "corpus must not shuffle for the join")
    assert(enc.agg(sum("bpe_tokens")).head().getLong(0) > 0)
    syms.unpersist()
  }

  test("encodeWord applies learned merges in order") {
    assert(BpeOps.encodeWord("hugs",
      Seq(("u", "g"), ("u", "n"), ("h", "ug"))) == Seq("hug", "s"))
    assert(BpeOps.encodeWord("pun",
      Seq(("u", "g"), ("u", "n"), ("h", "ug"))) == Seq("p", "un"))
  }
}
