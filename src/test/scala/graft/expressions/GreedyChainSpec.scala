package graft.expressions

import graft.SparkTestBase
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Differential parity for [[GreedyChainCount]] — the codegen'd
  * proximity chain-walk — against the higher-order-function formulation
  * it replaced in `phraseWindowScores` (the exact expression tree r15
  * shipped, pre-filter included), on real corpus occurrence frames and
  * on adversarial hand-built shapes. */
class GreedyChainSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfTiny/documents.parquet")

  private def fast(occ: Column, k: Column, maxSpan: Int): Column =
    GraftColumnBridge.column(GreedyChainCount(
      GraftColumnBridge.expression(occ),
      GraftColumnBridge.expression(k), maxSpan))

  /** The r15 HOF chain, verbatim: missing-offset pre-filter via a
    * when(), per-offset sorted position arrays, greedy fold with the
    * sentinel poison. */
  private def hof(occ: Column, k: Column, maxSpan: Int): Column = {
    val sentinel = Long.MaxValue / 2
    val pp = transform(sequence(lit(0), k - 1),
      i => array_sort(transform(
        filter(occ, o => o.getField("__i") === i),
        o => o.getField("pos"))))
    when(size(array_distinct(transform(occ, o => o.getField("__i")))) === k,
      size(filter(element_at(pp, 1), a =>
        aggregate(slice(pp, lit(2), k - 1), a,
          (prev, arr) => coalesce(
            get(filter(arr, q => q > prev), lit(0)),
            lit(sentinel))) - a <= maxSpan)).cast("long"))
      .otherwise(0L)
  }

  private def occFrame(terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    // real occurrence frames: every doc's occurrences of `terms`,
    // tagged with phrase offsets — the exact shape phraseWindowScores
    // aggregates per (query, doc)
    val qt = terms.zipWithIndex.toDF("term", "__i")
    docs.limit(200)
      .select(col("doc_id"), posexplode(
        filter(split(lower(col("text")), "\\s+"), t => t =!= "")))
      .select(col("doc_id"), col("col").as("term"),
        (col("pos") + 1).cast("long").as("pos"))
      .join(qt, "term")
      .groupBy("doc_id")
      .agg(collect_list(struct(col("__i"), col("pos"))).as("__occ"))
      .withColumn("__k", lit(terms.size))
  }

  test("greedy_chain_count equals the HOF chain on real corpus frames, " +
    "several phrase lengths and spans") {
    for ((terms, span) <- Seq(
        (Seq("the", "data"), 1),            // exact-phrase degeneration
        (Seq("the", "data"), 5),
        (Seq("batch", "scan", "hash"), 6),
        (Seq("the", "the", "data"), 4),     // repeated phrase word
        (Seq("the"), 0),                    // k = 1: every anchor fits
        (Seq("zzz-never", "the"), 3))) {    // offset 0 never occurs
      val f = occFrame(terms)
      val diff = f.withColumn("got", fast(col("__occ"), col("__k"), span))
        .withColumn("want", hof(col("__occ"), col("__k"), span))
        .filter(col("got") =!= col("want")).count()
      assert(diff == 0, s"terms=$terms span=$span")
    }
  }

  test("greedy_chain_count edge shapes: missing offsets, out-of-range " +
    "offsets, ties at span boundary, empty occ") {
    val rows = Seq(
      // (occ as (i, pos) pairs, k, maxSpan, expected)
      (Seq((0, 1L), (1, 2L)), 2, 1, 1L),              // exact adjacency
      (Seq((0, 1L), (1, 3L)), 2, 1, 0L),              // one past the span
      (Seq((0, 1L), (1, 3L)), 2, 2, 1L),              // boundary inclusive
      (Seq((0, 5L), (1, 4L)), 2, 9, 0L),              // order matters
      (Seq((0, 1L)), 2, 9, 0L),                       // offset 1 missing
      (Seq((0, 1L), (0, 7L), (1, 2L), (1, 8L)), 2, 1, 2L), // two anchors
      (Seq.empty[(Int, Long)], 2, 9, 0L),             // empty occurrences
      (Seq((0, 2L), (0, 2L), (1, 3L)), 2, 1, 2L))     // duplicate anchor rows
    val df = rows.zipWithIndex.map { case ((occ, k, span, want), id) =>
      (id, occ, k, span, want)
    }.toDF("id", "occ_raw", "k", "span", "want")
      .withColumn("__occ", transform(col("occ_raw"),
        p => struct(p.getField("_1").as("__i"),
          p.getField("_2").as("pos"))))
    // spans differ per row: evaluate each span value separately
    rows.map(_._3).distinct.foreach { span =>
      val part = df.filter(col("span") === span)
      val bad = part
        .withColumn("got", fast(col("__occ"), col("k"), span))
        .filter(col("got") =!= col("want")).collect()
      assert(bad.isEmpty, s"span=$span: ${bad.mkString(", ")}")
      // and the HOF reference agrees wherever it is defined (non-empty
      // occurrence lists with all offsets present are its domain; on
      // the rest the expression's documented zero matches it too)
      val bad2 = part
        .withColumn("got", fast(col("__occ"), col("k"), span))
        .withColumn("want2", hof(col("__occ"), col("k"), span))
        .filter(col("got") =!= col("want2")).collect()
      assert(bad2.isEmpty, s"span=$span vs HOF: ${bad2.mkString(", ")}")
    }
  }

  test("greedy_chain_count ignores out-of-domain offsets (__i >= k) the " +
    "upstream join can never produce") {
    // the HOF pre-filter would reject this row outright (distinct-offset
    // count != k); the expression documents the kinder semantics — the
    // stray offset is simply not part of any chain
    val df = Seq((1L, Seq((0, 1L), (1, 2L), (5, 9L))))
      .toDF("id", "occ_raw")
      .withColumn("__occ", transform(col("occ_raw"),
        p => struct(p.getField("_1").as("__i"),
          p.getField("_2").as("pos"))))
    val got = df.select(fast(col("__occ"), lit(2), 1)).head().getLong(0)
    assert(got == 1L)
  }
}
