package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[RangeJoinOps.binnedPointIntervalJoin]] — the gate entry
  * (j7_range_bin) hash-compares the production aggregate; this spec pins
  * pair-level equivalence with the naive range join, the bin-boundary
  * edge cases (point on a bin edge, interval exactly filling bins,
  * sub-bin-width intervals), and the plan: an equi join on the bin id,
  * never a nested loop. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("pair-for-pair equal to the naive range join, uniqueness included") {
    val points = spark.range(0, 5000)
      .select((col("id") * 37 % 9973).as("p"))
    val intervals = spark.range(0, 300)
      .select(col("id").as("iid"),
        (col("id") * 31 % 7000).as("lo"),
        (col("id") * 31 % 7000 + col("id") % 11 * 400 + 1).as("hi"))
    val binned = RangeJoinOps
      .binnedPointIntervalJoin(points, "p", intervals, "lo", "hi", 256L)
      .select("p", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(binned.sorted == naive.sorted, "must match the naive join exactly")
    assert(binned.size == binned.distinct.size,
      "bin replication must never emit a pair twice")
  }

  test("boundary cases: edges and sub-bin intervals") {
    val w = 10L
    val points = Seq(0L, 9L, 10L, 19L, 20L, 25L).toDF("p")
    val intervals = Seq(
      (1L, 0L, 10L),   // exactly bin 0
      (2L, 10L, 20L),  // exactly bin 1
      (3L, 5L, 15L),   // straddles bins 0-1
      (4L, 22L, 24L),  // strictly inside bin 2
      (5L, 19L, 20L)   // one-element interval on a bin's last slot
    ).toDF("iid", "lo", "hi")
    val got = RangeJoinOps
      .binnedPointIntervalJoin(points, "p", intervals, "lo", "hi", w)
      .select("p", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      0L -> 1L, 9L -> 1L, 9L -> 3L, 10L -> 2L, 10L -> 3L,
      19L -> 2L, 19L -> 5L))
  }

  test("interval-interval overlap join: pair-for-pair equal to the naive " +
    "theta join, exactly once, for ANY bin width") {
    val left = spark.range(0, 2000)
      .select(col("id").as("lid"),
        (col("id") * 37 % 9973).as("s1"))
      .withColumn("e1", col("s1") + col("lid") % 13 * 100 + 1)
    val right = spark.range(0, 400)
      .select(col("id").as("rid"),
        (col("id") * 31 % 7000).as("s2"))
      .withColumn("e2", col("s2") + col("rid") % 7 * 300 + 1)
    val naive = left.join(right,
        col("s1") < col("e2") && col("s2") < col("e1"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(naive.nonEmpty && naive.size > 2000,
      s"fixture must be genuinely many-to-many: ${naive.size}")
    // the result is bin-width INDEPENDENT — the first-shared-bin rule
    // emits each pair exactly once whatever the discretization
    Seq(64L, 256L, 4096L).foreach { w =>
      val binned = RangeJoinOps
        .binnedIntervalJoin(left, "s1", "e1", right, "s2", "e2", w)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(binned.sorted == naive, s"binWidth=$w diverged from naive")
      assert(binned.size == binned.distinct.size,
        s"binWidth=$w emitted a pair twice")
    }
  }

  test("interval-interval boundary cases: touching endpoints do not " +
    "overlap (half-open), shared-edge bins count once") {
    val w = 10L
    val left = Seq((1L, 0L, 10L), (2L, 5L, 25L), (3L, 20L, 21L))
      .toDF("lid", "s1", "e1")
    val right = Seq(
      (10L, 10L, 20L), // touches lid=1 at 10 AND lid=3 at 20 → NO overlap
      (11L, 0L, 30L),  // spans everything
      (12L, 24L, 40L)  // overlaps only lid=2's tail
    ).toDF("rid", "s2", "e2")
    val got = RangeJoinOps
      .binnedIntervalJoin(left, "s1", "e1", right, "s2", "e2", w)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      1L -> 11L, 2L -> 10L, 2L -> 11L, 2L -> 12L, 3L -> 11L))
  }

  test("NEGATIVE coordinates bin correctly (true floor division): both " +
    "join forms equal their naive joins on a signed domain") {
    // signed domain straddling zero — truncating div would collapse the
    // (-w, w) range into one bin and silently drop cross-bin pairs
    val points = spark.range(0, 2000)
      .select((col("id") * 37 % 7001 - 3500).as("p"))
    val intervals = spark.range(0, 300)
      .select(col("id").as("iid"),
        (col("id") * 31 % 6000 - 3000).as("lo"))
      .withColumn("hi", col("lo") + col("iid") % 11 * 90 + 1)
    val gotP = RangeJoinOps
      .binnedPointIntervalJoin(points, "p", intervals, "lo", "hi", 128L)
      .select("p", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val naiveP = points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(gotP == naiveP && gotP.nonEmpty)
    assert(gotP.size == gotP.distinct.size)

    val left = spark.range(0, 500)
      .select(col("id").as("lid"), (col("id") * 53 % 4000 - 2000).as("s1"))
      .withColumn("e1", col("s1") + col("lid") % 9 * 120 + 1)
    val right = spark.range(0, 200)
      .select(col("id").as("rid"), (col("id") * 41 % 4000 - 2000).as("s2"))
      .withColumn("e2", col("s2") + col("rid") % 5 * 250 + 1)
    val gotI = RangeJoinOps
      .binnedIntervalJoin(left, "s1", "e1", right, "s2", "e2", 256L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val naiveI = left.join(right,
        col("s1") < col("e2") && col("s2") < col("e1"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(gotI == naiveI && gotI.nonEmpty)
    assert(gotI.size == gotI.distinct.size)
  }

  test("keyed interval join restricts overlap to matching partition " +
    "keys (the per-contig form)") {
    val left = Seq(
      ("chr1", 1L, 0L, 100L), ("chr2", 2L, 0L, 100L), ("chr1", 3L, 90L, 150L))
      .toDF("contig", "lid", "s1", "e1")
    val right = Seq(
      ("chr1", 10L, 50L, 120L), ("chr2", 11L, 50L, 120L),
      ("chr3", 12L, 0L, 1000L))
      .toDF("contig", "rid", "s2", "e2")
    val got = RangeJoinOps.binnedIntervalJoinKeyed(
        left, "s1", "e1", right, "s2", "e2", 64L, keys = Seq("contig"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cross-contig overlaps must NOT pair; chr3's giant interval
    // matches nothing on the left
    assert(got == Set(1L -> 10L, 3L -> 10L, 2L -> 11L))
    // and the keyed result equals the naive keyed theta join on a
    // larger random fixture
    val l2 = spark.range(0, 800)
      .select((col("id") % 3).cast("string").as("k"), col("id").as("lid"),
        (col("id") * 37 % 5000).as("s1"))
      .withColumn("e1", col("s1") + col("lid") % 9 * 120 + 1)
    val r2 = spark.range(0, 300)
      .select((col("id") % 3).cast("string").as("k"), col("id").as("rid"),
        (col("id") * 53 % 5000).as("s2"))
      .withColumn("e2", col("s2") + col("rid") % 5 * 250 + 1)
    val naive = l2.join(r2.withColumnRenamed("k", "k2"),
        col("k") === col("k2") &&
          col("s1") < col("e2") && col("s2") < col("e1"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val binnedK = RangeJoinOps.binnedIntervalJoinKeyed(
        l2, "s1", "e1", r2, "s2", "e2", 256L, keys = Seq("k"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(naive.nonEmpty && binnedK == naive)
  }

  test("interval-interval plan is an equi join on the bin with both " +
    "sides data-sized") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val old = spark.conf.getOption(key)
    val oldAqe = spark.conf.getOption(aqeKey)
    try {
      spark.conf.set(key, "-1")
      spark.conf.set(aqeKey, "-1")
      val left = spark.range(0, 3000)
        .select(col("id").as("lid"), (col("id") * 7).as("s1"))
        .withColumn("e1", col("s1") + 20)
      val right = spark.range(0, 3000)
        .select(col("id").as("rid"), (col("id") * 5).as("s2"))
        .withColumn("e2", col("s2") + 15)
      val df = RangeJoinOps
        .binnedIntervalJoin(left, "s1", "e1", right, "s2", "e2", 32L)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"interval join must not nest-loop:\n$p")
      assert(p.contains("SortMergeJoin [__bin") || p.contains("HashJoin [__bin"), p)
    } finally {
      old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      oldAqe.fold(spark.conf.unset(aqeKey))(spark.conf.set(aqeKey, _))
    }
  }

  test("keyed interval-interval plan equi-joins on (bin, key); no nested loop") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val old = spark.conf.getOption(key)
    val oldAqe = spark.conf.getOption(aqeKey)
    try {
      spark.conf.set(key, "-1")
      spark.conf.set(aqeKey, "-1")
      val left = spark.range(0, 3000)
        .select((col("id") % 4).cast("string").as("k"),
          col("id").as("lid"), (col("id") * 7).as("s1"))
        .withColumn("e1", col("s1") + 20)
      val right = spark.range(0, 3000)
        .select((col("id") % 4).cast("string").as("k"),
          col("id").as("rid"), (col("id") * 5).as("s2"))
        .withColumn("e2", col("s2") + 15)
      val df = RangeJoinOps.binnedIntervalJoinKeyed(
        left, "s1", "e1", right, "s2", "e2", 32L, keys = Seq("k"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"keyed interval join must not nest-loop:\n$p")
      // the shuffle key is (bin, key) — both columns in the equi-join keys
      assert("""(SortMergeJoin|HashJoin) \[__bin#\d+L?, k#""".r.findFirstIn(p).isDefined,
        s"join keys must be (__bin, k):\n$p")
    } finally {
      old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      oldAqe.fold(spark.conf.unset(aqeKey))(spark.conf.set(aqeKey, _))
    }
  }

  test("plan is an equi join on the bin, never a nested loop") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val old = spark.conf.getOption(key)
    val oldAqe = spark.conf.getOption(aqeKey)
    try {
      // the 100 TB case: neither side broadcastable
      spark.conf.set(key, "-1")
      spark.conf.set(aqeKey, "-1")
      val points = spark.range(0, 1000).select(col("id").as("p"))
      val intervals = spark.range(0, 50)
        .select(col("id").as("iid"),
          (col("id") * 20).as("lo"), (col("id") * 20 + 60).as("hi"))
      val df = RangeJoinOps
        .binnedPointIntervalJoin(points, "p", intervals, "lo", "hi", 20L)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"range join must not nest-loop:\n$p")
      assert(p.contains("SortMergeJoin [__bin") || p.contains("HashJoin [__bin"), p)
    } finally {
      old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      oldAqe.fold(spark.conf.unset(aqeKey))(spark.conf.set(aqeKey, _))
    }
  }
}
