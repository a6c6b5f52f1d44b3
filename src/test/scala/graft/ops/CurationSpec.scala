package graft.ops

import graft.SparkTestBase
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Value-level invariants of the corpus-curation queries (the hash-level
  * check is the DuckDB gate; these pin the SEMANTICS the hashes encode). */
class CurationSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sfSmall/documents.parquet")

  test("dedup_clusters: pairs land in one cluster; ids are min members") {
    val assign = SparkEntry.queries("dedup_clusters")(spark, sfSmall)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = DedupOps.jaccardPairs(docs, w = 3, threshold = 0.5, maxDf = 64)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty) // the fixture corpus must exercise the operator
    pairs.foreach { case (a, b) =>
      assert(assign(a) == assign(b), s"pair ($a,$b) split across clusters")
    }
    // every cluster id is the minimum of its members
    assign.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid not named by its min")
    }
    // assignment is total over the corpus
    assert(assign.size == docs.count())
    // near-dup graphs are shallow (clique-ish clusters): the alternating
    // loop must converge in a handful of rounds, not O(diameter)
    val (_, rounds) = GraphOps.connectedComponentsWithRounds(
      DedupOps.jaccardPairs(docs, w = 3, threshold = 0.5, maxDf = 64),
      "id_a", "id_b")
    assert(rounds <= 6, s"CC took $rounds rounds on the jaccard graph")
  }

  test("pack_sequences: equals the driver-side concat-then-chunk") {
    val got = SparkEntry.queries("pack_sequences")(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val counts = docs.select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    val expect = counts.map { case (id, n) =>
      val seq = cum / 512; cum += n; (id, n, seq)
    }
    assert(got.toSeq == expect.toSeq)
    // seq ids are non-decreasing and start at 0
    assert(got.head._3 == 0L)
    assert(got.sliding(2).forall(w => w(0)._3 <= w(1)._3))
  }

  test("split_assign: deterministic, consistent, all splits present") {
    val a = SparkEntry.queries("split_assign")(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val b = SparkEntry.queries("split_assign")(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq) // rerun-stable
    a.foreach { case (id, bucket, split) =>
      assert(bucket >= 0 && bucket < 100)
      val expect = if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
      assert(split == expect, s"doc $id bucket $bucket labeled $split")
    }
    assert(a.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"))
    // a doc's split must not depend on corpus contents: recompute on a
    // 10%-subset reader and compare the overlap
    val sub = SparkEntry.queries("split_assign")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val full = a.map(t => t._1 -> t._3).toMap
    sub.foreach { case (id, s) =>
      assert(full.get(id).forall(_ == s), s"doc $id split changed with corpus")
    }
  }

  test("sample_per_source: exact quota, contiguous ranks, subset") {
    val got = SparkEntry.queries("sample_per_source")(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = got.groupBy(_._2)
    val nPerSource = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rows) =>
      val quota = math.min(5L, nPerSource(src))
      assert(rows.length == quota, s"$src returned ${rows.length}")
      assert(rows.map(_._3).sorted.toSeq == (1L to quota))
    }
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(t => ids(t._1)))
  }

  test("sample_mixture: deterministic, weight-1 keeps all, proportions near target") {
    val run = () => SparkEntry.queries("sample_mixture")(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val a = run()
    assert(a.sortBy(_._1).toSeq == run().sortBy(_._1).toSeq) // rerun-stable
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.forall(t => ids(t._1))) // strict subset of the corpus
    // weight is a pure function of the source suffix
    a.foreach { case (_, src, ppm) =>
      assert(ppm == (src.drop(3).toLong % 4 + 1) * 250000L, s"$src -> $ppm")
    }
    // ppm >= 1e6 maps to the FULL hash space: weight-1.0 sources keep
    // every doc, by construction not by luck
    val nPerSource = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_._2).map { case (s, rows) => s -> rows.length.toLong }
    nPerSource.keys.filter(_.drop(3).toLong % 4 == 3).foreach { src =>
      assert(kept.getOrElse(src, 0L) == nPerSource(src), s"weight-1.0 $src dropped docs")
    }
    // realized fraction per weight CLASS (5 sources x 25 docs = 125 trials
    // at sf0.01) within +-0.15 of target — ~4 sigma of Binomial(125, w),
    // and deterministic anyway on the fixed testdata. (.toSeq: a Set.map
    // would collapse sources with equal counts before summing)
    (0 to 3).foreach { cls =>
      val target = (cls + 1) * 0.25
      val srcs = nPerSource.keys.toSeq.filter(_.drop(3).toLong % 4 == cls)
      val n = srcs.map(nPerSource).sum.toDouble
      val k = srcs.map(s => kept.getOrElse(s, 0L)).sum.toDouble
      assert(math.abs(k / n - target) <= 0.15,
        s"weight class $target realized ${k / n} over $n docs")
    }
  }

  test("sourceSuffixPpm: unbounded suffix — 10-digit source ids don't truncate") {
    import spark.implicits._
    // 10-digit suffixes: a SUBSTR(source, 4, 8)-style cap would read only
    // the first 8 digits and derive the WRONG weight class for exactly
    // the ids below whose full-vs-truncated suffix differ mod 4
    val longIds = Seq(
      (1L, "src1234567890"), // full % 4 = 2; first-8 (12345678) % 4 = 2
      (2L, "src1234567891"), // full % 4 = 3
      (3L, "src9999999998"), // full % 4 = 2; first-8 (99999999) % 4 = 3
      (4L, "src9999999997")  // full % 4 = 1
    ).toDF("doc_id", "source")
    val ppm = graft.queries.CurationOps
      .sourceSuffixPpm(mod = 4, mulPpm = 250000L, addPpm = 250000L)
    val got = longIds.select(col("doc_id"), ppm.as("weight_ppm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def expect(sfx: String): Long = (sfx.toLong % 4 + 1) * 250000L
    assert(got(1L) == expect("1234567890"))
    assert(got(2L) == expect("1234567891"))
    assert(got(3L) == expect("9999999998"))
    assert(got(4L) == expect("9999999997"))
    // and the full sample path accepts/derives on the same untruncated ppm
    val sampled = graft.queries.CurationOps
      .mixtureSample(longIds, "doc_id", ppm)
      .select("doc_id", "weight_ppm")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sampled.foreach { case (id, w) => assert(w == got(id), s"doc $id") }
  }

  test("sample_upweight: per-class repetition semantics, contiguous reps") {
    val got = SparkEntry.queries("sample_upweight")(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // reps are contiguous 1..n_rep per doc
    got.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length), s"doc $id")
    }
    val nPerSource = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val copiesByDoc = got.groupBy(_._1).map { case (id, rows) =>
      id -> (rows.head._2, rows.length.toLong)
    }
    def cls(src: String) = src.drop(3).toLong % 3
    // weight 2.0 (class 2): EVERY doc exactly twice, by construction
    nPerSource.keys.toSeq.filter(cls(_) == 2).foreach { src =>
      val cs = copiesByDoc.collect { case (_, (s, n)) if s == src => n }
      assert(cs.size.toLong == nPerSource(src) && cs.forall(_ == 2L), src)
    }
    // weight 1.25 (class 1): every doc at least once, never more than twice
    nPerSource.keys.toSeq.filter(cls(_) == 1).foreach { src =>
      val cs = copiesByDoc.collect { case (_, (s, n)) if s == src => n }
      assert(cs.size.toLong == nPerSource(src) && cs.forall(n => n == 1L || n == 2L), src)
    }
    // weight 0.5 (class 0): subset, one copy each — and the ACCEPTED SET
    // matches mixtureSample at the same weight (shared threshold math)
    val half = graft.queries.CurationOps.mixtureSample(
      docs.filter(expr("CAST(SUBSTR(source, 4) AS LONG) % 3 = 0")),
      "doc_id", lit(500000L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val upHalf = copiesByDoc.collect { case (id, (s, n)) if cls(s) == 0 => (id, n) }
    assert(upHalf.forall(_._2 == 1L))
    assert(upHalf.map(_._1).toSet == half)
    // rerun-stable
    val again = SparkEntry.queries("sample_upweight")(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
  }

  test("curation_funnel: monotone stages, consistent with split_assign") {
    val r = SparkEntry.queries("curation_funnel")(spark, sfSmall).collect().head
    val (total, gated, surv, train) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(total == docs.count())
    assert(total >= gated && gated >= surv && surv >= train,
      s"funnel not monotone: $total/$gated/$surv/$train")
    assert(train > 0, "train stage must survive on the fixture corpus")
    // the train stage is split_assign's bucket rule applied to survivors:
    // ratio should sit near 90% (loose — survivor hash mix is arbitrary)
    assert(train.toDouble / surv >= 0.75 && train <= surv)
  }
}
