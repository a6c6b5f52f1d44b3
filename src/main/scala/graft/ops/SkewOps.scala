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
  * AQE's skew-join handling covers joins; this is the groupBy analog.
  *
  * The salt is DETERMINISTIC (content hash): a salt from
  * `monotonically_increasing_id` changes when a lost shuffle map task is
  * recomputed, so reducers that fetched the old output and reducers that
  * fetch the replay see the same row under different salts — the
  * double-count/drop correctness class of SPARK-23207, hit exactly at the
  * executor-loss scale salting exists for. The content hash is stable
  * across replays; its one caveat — byte-identical rows share a salt, so
  * a hot key made of EXACT duplicates doesn't spread — is the acceptable
  * trade (exact-duplicate volume belongs in a count column upstream).
  */
object SkewOps {

  private def contentSalt(df: DataFrame, saltBuckets: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(saltBuckets))

  /** Salted two-phase aggregation for functions that are their OWN
    * combine (idempotent-merge monoids: sum, min, max — applying the
    * function to partials yields the total). NOT for count: re-counting
    * partials counts partial ROWS (≤ saltBuckets per key), not input
    * rows — use [[saltedCount]], whose combine is the sum of partial
    * counts. Avg and other non-monoid shapes need their own
    * sufficient-statistics decomposition. */
  def saltedAgg(df: DataFrame, keyCols: Seq[String],
                aggs: Seq[(String, Column => Column)], valueCol: String => Column,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", contentSalt(df, saltBuckets))
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
    val salted = df.withColumn("__salt", contentSalt(df, saltBuckets))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pn"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__pn").as(out))
  }
}
