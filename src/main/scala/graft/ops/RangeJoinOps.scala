package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval joins without an equi key.
  *
  * Spark plans a pure range condition (`lo <= p AND p < hi`) as a
  * nested-loop join — O(|points| × |intervals|) comparisons and, when
  * neither side is broadcastable, a plan that simply does not run at
  * 100 TB. The standard fix (Databricks' range-join optimization,
  * Postgres GiST bins) is to discretize: slice the value domain into
  * fixed-width bins, replicate each interval into every bin it touches,
  * tag each point with its single bin, and run a plain shuffled EQUI join
  * on the bin id with the exact range predicate as a residual filter.
  *
  * Cost model: intervals replicate ×(span/binWidth + 1) — pick binWidth
  * near the typical interval span so the blow-up is a small constant —
  * and the join itself becomes hash-partitionable, AQE-skew-splittable,
  * and codegen'd like any other equi join. Each (interval, bin) row is
  * unique and a point owns exactly one bin, so no pair is produced twice
  * (no post-join dedup needed).
  *
  * Domain requirement: `p`, `lo`, `hi` non-negative integers with
  * `lo < hi` (half-open [lo, hi)); `div` is floor division there.
  */
object RangeJoinOps {

  /** Join `points` (column `pCol`) to `intervals` ([`loCol`, `hiCol`))
    * on containment, as a bin-equi join. Output: all columns of both
    * inputs, one row per containing (point, interval) pair. */
  def binnedPointIntervalJoin(
      points: DataFrame,
      pCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        expr(s"$loCol div $binWidth"),
        expr(s"($hiCol - 1) div $binWidth"))))
    points
      .withColumn("__bin", expr(s"$pCol div $binWidth"))
      .join(binned, "__bin")
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__bin")
  }
}
