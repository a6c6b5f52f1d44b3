package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[RetrievalOps.rrfFuse]] — the gate (hybrid_rrf) hash-compares the
  * full sparse+dense fusion against DuckDB; this spec pins the fusion
  * semantics in isolation. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("single-list fusion preserves the list's order; points are the " +
    "fixed-point reciprocals") {
    val got = RetrievalOps.rrfFuse(
      Seq(ranks((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))), topK = 10)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(10L, 11L, 12L))
    assert(got.map(_._3).toSeq == Seq(
      math.round(1e9 / 61), math.round(1e9 / 62), math.round(1e9 / 63)))
  }

  test("a doc on both lists outranks same-rank single-list docs; " +
    "n_lists reports the agreement") {
    val bm = ranks((1L, 10L, 1L), (1L, 11L, 2L))
    val dn = ranks((1L, 10L, 2L), (1L, 12L, 1L))
    val got = RetrievalOps.rrfFuse(Seq(bm, dn), topK = 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // doc 10: 1/(61) + 1/(62) beats doc 12's 1/(61) and doc 11's 1/(62)
    assert(got(10L)._1 == 1L && got(10L)._3 == 2L)
    assert(got(12L)._1 == 2L && got(12L)._3 == 1L)
    assert(got(11L)._1 == 3L && got(11L)._3 == 1L)
    assert(got(10L)._2 ==
      math.round(1e9 / 61) + math.round(1e9 / 62))
  }

  test("weighted fusion: all-1 weights rank exactly like rrfFuse; a " +
    "heavier list wins disagreements its weight justifies; points are " +
    "the exact ppm-scaled integers") {
    val bm = ranks((1L, 10L, 1L), (1L, 11L, 2L))
    val dn = ranks((1L, 11L, 1L), (1L, 10L, 2L))
    // all-1 weights ≡ rrfFuse ranking (scores 1e6x scaled)
    val plain = RetrievalOps.rrfFuse(Seq(bm, dn), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._3)
    val ones = RetrievalOps.rrfFuseWeighted(Seq((bm, 1.0), (dn, 1.0)),
      topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._3)
    assert(ones.map(t => (t._1, t._2, t._3)).toSeq ==
      plain.map(t => (t._1, t._2, t._3)).toSeq)
    assert(ones.map(_._4).toSeq == plain.map(_._4 * 1000000L).toSeq)
    // the two lists disagree symmetrically (10 vs 11) — at equal
    // weights doc_id tie-breaks; a 2x bm weight must put bm's #1 first
    val weighted = RetrievalOps.rrfFuseWeighted(Seq((bm, 2.0), (dn, 1.0)),
      topK = 10)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(weighted.head._1 == 10L,
      "the heavier retriever's top doc must win the disagreement")
    assert(weighted.head._2 ==
      2000000L * math.round(1e9 / 61) + 1000000L * math.round(1e9 / 62))
  }

  test("per-query top-k is independent across queries") {
    val lists = ranks(
      (1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L))
    val got = RetrievalOps.rrfFuse(Seq(lists), topK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }
}
