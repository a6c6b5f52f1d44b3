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
