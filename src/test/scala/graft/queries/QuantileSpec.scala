package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Sketch-vs-exact bounds for the two estimators whose values cannot be
  * oracle-hashed (engine/merge-order-specific): `approx_percentile` and
  * `approx_count_distinct`. The oracle gate covers their exact twins
  * (a_quantile_disc, ev_hll_users' exact column + bound claim); here the
  * approximate values themselves are pinned inside their advertised
  * error envelopes on real data. */
class QuantileSpec extends SparkTestBase {

  test("approx_percentile lands within rank tolerance of the exact quantile") {
    val li = spark.read.parquet(s"$sfSmall/lineitem.parquet")
      .select(col("l_quantity")).cache()
    try {
      val n = li.count()
      val exactSorted = li.orderBy("l_quantity").collect().map(_.getDouble(0))
      val acc = 1000 // Spark's accuracy knob: rank error <= n / acc
      val approx = li.agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(acc)),
        percentile_approx(col("l_quantity"), lit(0.9), lit(acc)),
        percentile_approx(col("l_quantity"), lit(0.99), lit(acc))
      ).head()
      for ((p, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
        val got = approx.getDouble(i)
        val rankTol = math.max(1L, n / acc)
        val lo = exactSorted((math.ceil(p * n).toLong - 1 - rankTol).max(0).toInt)
        val hi = exactSorted((math.ceil(p * n).toLong - 1 + rankTol).min(n - 1).toInt)
        assert(got >= lo && got <= hi,
          s"p$p approx=$got outside rank-tolerance [$lo,$hi]")
      }
    } finally li.unpersist()
  }

  test("approx_count_distinct is within rsd bound and partitioning-invariant") {
    val ev = tEvents(spark, sfSmall)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val est1 = ev.select(approx_count_distinct(col("user_id"), 0.02))
      .head().getLong(0)
    // HLL++ registers merge by max — the estimate cannot depend on how the
    // rows were partitioned (the property that makes it safe at any scale)
    val est2 = ev.repartition(17, col("event_type"))
      .select(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    assert(est1 == est2, s"partitioning changed the sketch: $est1 vs $est2")
    assert(math.abs(est1 - exact) <= 0.05 * exact,
      s"estimate $est1 outside 5% of exact $exact")
  }
}
