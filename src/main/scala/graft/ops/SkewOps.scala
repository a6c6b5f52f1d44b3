package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation: when one group key carries a disproportionate
  * share of rows (the hot-key problem at 100 TB), a plain groupBy funnels
  * that key's entire volume through one reduce task. Salting splits each key
  * into `saltBuckets` sub-keys for the first (wide) aggregation, then
  * combines the per-salt partials with a second, tiny aggregation — the
  * second shuffle moves only |keys|×buckets rows.
  *
  * AQE's skew-join handling covers joins; this is the groupBy analog,
  * applicable when the combine function is associative (sum/count/min/max).
  */
object SkewOps {

  def saltedAgg(df: DataFrame, keyCols: Seq[String],
                aggs: Seq[(String, Column => Column)], valueCol: String => Column,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partials = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2(valueCol(aggs.head._1)).as(s"p_${aggs.head._1}"),
        aggs.tail.map(a => a._2(valueCol(a._1)).as(s"p_${a._1}")): _*)
    partials
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head._2(col(s"p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map(a => a._2(col(s"p_${a._1}")).as(a._1)): _*)
  }

  /** Salted count per key — combine = sum of partial counts. */
  def saltedCount(df: DataFrame, keyCols: Seq[String],
                  out: String = "n", saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pn"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__pn").as(out))
  }
}
