package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Globally-ordered window operators without the single-partition cliff.
  *
  * A bare `Window.orderBy(k)` moves the whole dataset to ONE task — fine at
  * 60k rows, fatal at 100 TB. These helpers implement the classic two-phase
  * distributed scan instead:
  *
  *   1. `repartitionByRange(k)` — the shuffle that a global sort needs
  *      anyway, but into N parallel, range-disjoint partitions;
  *   2. the window runs *partitioned by* `spark_partition_id()` — N
  *      parallel WindowExecs;
  *   3. a per-partition summary (sum / count / last value) — N rows — is
  *      collected and folded into a literal lookup that patches partition
  *      boundaries (the carry of the scan).
  *
  * Results are identical to the single-partition plan for unique order
  * keys; cost is one extra tiny job instead of one giant task.
  */
object ScalableWindow {

  private val Pid = "__swpid"

  private def ranged(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartitionByRange(n, orderCols.map(col): _*)
      .withColumn(Pid, spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  private def pidWindow(orderCols: Seq[String]) =
    Window.partitionBy(Pid).orderBy(orderCols.map(col): _*)

  /** Literal pid→value lookup from collected (pid, value) rows. */
  private def lut(rows: Seq[(Int, Any)], default: Column): Column =
    rows.foldLeft(default) { case (acc, (pid, v)) =>
      when(col(Pid) === pid, lit(v)).otherwise(acc)
    }

  /** Running sum of `value` over the global `orderCols` order, exclusive of
    * the current row (the prefix-sum / scanLeft shape, SURVEY.md A15/W3). */
  def prefixSumExclusive(df: DataFrame, orderCols: Seq[String],
                         value: Column, out: String): DataFrame = {
    val r = ranged(df, orderCols)
    val partials = r.groupBy(Pid).agg(sum(value).as("s")).collect()
      .map(row => row.getInt(0) -> row.get(1)).sortBy(_._1)
    // carry(pid) = sum of all partials before pid
    var acc: java.math.BigDecimal = java.math.BigDecimal.ZERO
    val carries = partials.map { case (pid, s) =>
      val c = (pid, acc: Any)
      if (s != null) acc = acc.add(new java.math.BigDecimal(s.toString))
      c
    }
    val within = sum(value).over(
      pidWindow(orderCols).rowsBetween(Window.unboundedPreceding, -1))
    r.withColumn(out,
      coalesce(within, lit(0)) + coalesce(lut(carries.toSeq, lit(null)), lit(0)))
      .drop(Pid)
  }

  /** Global row_number() without a single-partition sort. */
  def rowNumber(df: DataFrame, orderCols: Seq[String], out: String): DataFrame = {
    val r = ranged(df, orderCols)
    val counts = r.groupBy(Pid).count().collect()
      .map(row => row.getInt(0) -> row.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) => val c = (pid, acc: Any); acc += n; c }
    r.withColumn(out,
      row_number().over(pidWindow(orderCols)) +
        coalesce(lut(offsets.toSeq, lit(0L)), lit(0L)).cast("int"))
      .drop(Pid)
  }

  /** lag(value, 1) over the global order; partition-first rows take the
    * previous partition's last value (the carry row). */
  def lag1(df: DataFrame, orderCols: Seq[String], value: String,
           out: String): DataFrame = {
    val r = ranged(df, orderCols)
    val lastPerPid = r.groupBy(Pid)
      .agg(max(struct(orderCols.map(col) :+ col(value).as("__v"): _*)).as("m"))
      .select(col(Pid), col("m.__v")).collect()
      .map(row => (row.getInt(0) + 1) -> row.get(1))
    val dt = df.schema(value).dataType.simpleString
    r.withColumn(out,
      coalesce(
        lag(value, 1).over(pidWindow(orderCols)),
        lut(lastPerPid.toSeq, lit(null)).cast(dt)))
      .drop(Pid)
  }

  /** lead(value, 1) with `default` past the end; partition-last rows take
    * the next partition's first value. */
  def lead1(df: DataFrame, orderCols: Seq[String], value: String,
            out: String, default: Column): DataFrame = {
    val r = ranged(df, orderCols)
    val firstPerPid = r.groupBy(Pid)
      .agg(min(struct(orderCols.map(col) :+ col(value).as("__v"): _*)).as("m"))
      .select(col(Pid), col("m.__v")).collect()
      .map(row => (row.getInt(0) - 1) -> row.get(1))
    val dt = df.schema(value).dataType.simpleString
    r.withColumn(out,
      coalesce(
        lead(value, 1).over(pidWindow(orderCols)),
        lut(firstPerPid.toSeq, lit(null)).cast(dt),
        default))
      .drop(Pid)
  }
}
