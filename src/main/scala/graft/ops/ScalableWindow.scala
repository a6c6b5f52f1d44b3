package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Globally-ordered window operators without the single-partition cliff.
  *
  * A bare `Window.orderBy(k)` moves the whole dataset to ONE task — fine at
  * 60k rows, fatal at 100 TB. These helpers implement the classic two-phase
  * distributed scan instead, entirely inside one declarative plan:
  *
  *   1. `repartitionByRange(k)` — the shuffle a global sort needs anyway,
  *      into N parallel, range-disjoint partitions;
  *   2. the window runs *partitioned by* `spark_partition_id()` — N
  *      parallel WindowExecs;
  *   3. the carry of the scan (per-partition sum / count / edge value) is a
  *      tiny aggregate — ONE ROW PER PARTITION, bounded by the cluster's
  *      partition count, not the data — combined across partitions by a
  *      theta-join on the partition id (pid' < pid ⇒ prefix, pid' > pid ⇒
  *      suffix) and broadcast-joined back on the partition id.
  *
  * Because the carry branch and the main branch hang off the *same*
  * `repartitionByRange` exchange, Catalyst's ReuseExchange collapses them
  * to one shuffle — no `persist` (round 1 leaked a MEMORY_AND_DISK cache
  * per call), no driver-side `collect`, no O(#partitions) chained-`when`
  * lookup. The cross-partition carry is a join, NOT a partition-less
  * window: a bare `Window.orderBy(pid)` over the carry frame would be
  * bounded too, but it trips Spark's single-partition WindowExec warning
  * and — unlike `lag(pid)`-style neighbours — a theta-join stays correct
  * when range partitions come out EMPTY (adjacent pids then aren't
  * adjacent carry rows). O(#partitions²) comparisons ≈ 4M at 2000
  * partitions — negligible, and fully distributed. Results are identical
  * to the single-partition plan for unique order keys.
  */
object ScalableWindow {

  private val Pid = "__swpid"

  private def ranged(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartitionByRange(n, orderCols.map(col): _*)
      .withColumn(Pid, spark_partition_id())
  }

  private def pidWindow(orderCols: Seq[String]) =
    Window.partitionBy(Pid).orderBy(orderCols.map(col): _*)

  /** Running sum of `value` over the global `orderCols` order, exclusive of
    * the current row (the prefix-sum / scanLeft shape, SURVEY.md A15/W3). */
  def prefixSumExclusive(df: DataFrame, orderCols: Seq[String],
                         value: Column, out: String): DataFrame = {
    val r = ranged(df, orderCols)
    val agg = r.groupBy(Pid).agg(sum(value).as("__s"))
    val b = agg.select(col(Pid).as("__bp"), col("__s").as("__bs"))
    val carry = agg.join(b, col("__bp") < col(Pid), "left")
      .groupBy(Pid).agg(coalesce(sum("__bs"), lit(0)).as("__carry"))
    val within = sum(value).over(
      pidWindow(orderCols).rowsBetween(Window.unboundedPreceding, -1))
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out, coalesce(within, lit(0)) + coalesce(col("__carry"), lit(0)))
      .drop(Pid, "__carry")
  }

  /** Global row_number() without a single-partition sort. */
  def rowNumber(df: DataFrame, orderCols: Seq[String], out: String): DataFrame = {
    val r = ranged(df, orderCols)
    val agg = r.groupBy(Pid).agg(count(lit(1)).as("__c"))
    val b = agg.select(col(Pid).as("__bp"), col("__c").as("__bc"))
    val carry = agg.join(b, col("__bp") < col(Pid), "left")
      .groupBy(Pid).agg(coalesce(sum("__bc"), lit(0L)).as("__off"))
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out,
        row_number().over(pidWindow(orderCols)) +
          coalesce(col("__off"), lit(0L)).cast("int"))
      .drop(Pid, "__off")
  }

  /** lag(value, 1) over the global order. Partition-first rows take the
    * last value of the nearest NON-EMPTY preceding partition (max_by over
    * the pid theta-join); the carry applies ONLY to the first row of each
    * partition (gated on row_number, not on lag() being null, so a
    * legitimately-null predecessor value stays null). */
  def lag1(df: DataFrame, orderCols: Seq[String], value: String,
           out: String): DataFrame = {
    val r = ranged(df, orderCols)
    val ord = struct(orderCols.map(col): _*)
    val last = r.groupBy(Pid).agg(max_by(col(value), ord).as("__last"))
    val b = last.select(col(Pid).as("__bp"), col("__last").as("__bl"))
    val carry = last.join(b, col("__bp") < col(Pid), "left")
      .groupBy(Pid).agg(max_by(col("__bl"), col("__bp")).as("__carry"))
    val w = pidWindow(orderCols)
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out,
        when(row_number().over(w) === 1, col("__carry"))
          .otherwise(lag(value, 1).over(w)))
      .drop(Pid, "__carry")
  }

  /** First non-null `value` at-or-after the current row in the global
    * `orderCols` order (backward fill — the "next record start" shape of
    * check-blocks). `value` may be any type incl. struct; rows past the
    * last non-null get null. */
  def fillBackward(df: DataFrame, orderCols: Seq[String],
                   value: Column, out: String): DataFrame = {
    val r = ranged(df, orderCols).withColumn("__v", value)
    val ord = struct(orderCols.map(col): _*)
    // first non-null per partition, by order: min over (order, value)
    // structs of the non-null rows (nulls drop out of min)
    val fnn = r.groupBy(Pid)
      .agg(min(when(col("__v").isNotNull,
        struct(ord.as("__o"), col("__v").as("__x")))).as("__fnn"))
    val b = fnn.select(col(Pid).as("__bp"), col("__fnn").as("__bf"))
    // nearest following partition that HAS a non-null value
    val carry = fnn.join(b, col("__bp") > col(Pid) && col("__bf").isNotNull, "left")
      .groupBy(Pid).agg(min_by(col("__bf.__x"), col("__bp")).as("__carry"))
    val within = first(col("__v"), ignoreNulls = true).over(
      pidWindow(orderCols).rowsBetween(0, Window.unboundedFollowing))
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out, coalesce(within, col("__carry")))
      .drop(Pid, "__v", "__carry")
  }

  /** lead(value, 1) with `default` past the global end. Partition-last rows
    * take the first value of the nearest non-empty following partition; the
    * struct-wrapped carry distinguishes "no following partition" (→
    * default) from "next value is null" (→ null), matching
    * single-partition lead semantics. */
  def lead1(df: DataFrame, orderCols: Seq[String], value: String,
            out: String, default: Column): DataFrame = {
    val r = ranged(df, orderCols)
    val ord = struct(orderCols.map(col): _*)
    val firstA = r.groupBy(Pid).agg(min_by(col(value), ord).as("__first"))
    val b = firstA.select(col(Pid).as("__bp"),
      struct(col("__first").as("__v")).as("__bf"))
    val carry = firstA.join(b, col("__bp") > col(Pid), "left")
      .groupBy(Pid).agg(min_by(col("__bf"), col("__bp")).as("__carry"))
    val w = pidWindow(orderCols)
    val isLast = row_number().over(w) === count(lit(1)).over(Window.partitionBy(Pid))
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out,
        when(isLast,
          when(col("__carry").isNull, default).otherwise(col("__carry.__v")))
          .otherwise(lead(value, 1).over(w)))
      .drop(Pid, "__carry")
  }
}
