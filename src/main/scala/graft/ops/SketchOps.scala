package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed frequency sketches.
  *
  * Exact heavy-hitter queries (`GROUP BY key ORDER BY n DESC LIMIT k`)
  * shuffle one row per DISTINCT key — at 100 TB with a high-cardinality
  * key (URLs, user ids, n-grams) the aggregation state itself is the
  * bottleneck. A Misra-Gries summary caps the state at `k` counters per
  * partition and ships only those through the partial-agg tree, trading
  * exactness for a PROVABLE bound: after any sequence of merges
  * (Agarwal et al., "Mergeable Summaries", PODS'12 — MG summaries merge
  * by counter-sum + decrement-by-(k+1)th-largest), every key with true
  * frequency > n/(k+1) is present, and its reported count undershoots the
  * true count by at most n/(k+1). The bound — not the raw counter values,
  * which depend on merge order — is what downstream code may rely on, and
  * it is what the gate's self-check oracle asserts.
  */
object SketchOps {

  /** Misra-Gries top-k summary as a typed [[Aggregator]]: buffer and
    * result are a plain `counter -> weight` map of size ≤ k, natively
    * encodable (no kryo), mergeable in any order. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, "MisraGries needs k >= 1")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
      b.get(key) match {
        case Some(c) => b.updated(key, c + 1)
        case None if b.size < k => b.updated(key, 1L)
        case None =>
          // classic MG step: a full summary + an unseen key decrements
          // every counter (the unseen key's single occurrence cancels too)
          b.flatMap { case (ky, c) => if (c > 1) Some(ky -> (c - 1)) else None }
      }

    /** Counter-sum, then shrink back to k by subtracting the (k+1)-th
      * largest combined count — the mergeable-summaries rule that keeps
      * the total error additive (≤ n/(k+1) after any merge tree). */
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val combined = y.foldLeft(x) { case (m, (ky, c)) =>
        m.updated(ky, m.getOrElse(ky, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
        combined.flatMap { case (ky, c) =>
          if (c > cut) Some(ky -> (c - cut)) else None
        }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** The MG summary of `key` as a single aggregate Column (map type). */
  def misraGries(key: Column, k: Int): Column =
    udaf(new MisraGries(k)).apply(key)

  /** Self-checking heavy-hitters frame: for every key whose TRUE
    * frequency exceeds n/(k+1) (computed exactly), report the exact count
    * plus `within_bound` — whether the MG sketch found the key with
    * undercount ≤ n/(k+1), the paper guarantee. The exact side is the
    * oracle-comparable part; the sketch's raw counters never leave this
    * function (they are merge-order-dependent, the bound is not).
    */
  def heavyHittersChecked(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    val keyed = df.select(keyCol.cast("string").as("key"))
    val sketch = keyed.agg(misraGries(col("key"), k).as("__sketch"))
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("exact_n"))
    val total = exact.agg(sum("exact_n").as("__n"))
    exact
      .join(broadcast(total))
      .join(broadcast(sketch))
      .filter(col("exact_n") * (k + 1) > col("__n"))
      .select(
        col("key"), col("exact_n"),
        (element_at(col("__sketch"), col("key")).isNotNull &&
          (col("exact_n") - coalesce(element_at(col("__sketch"), col("key")), lit(0L)))
            * (k + 1) <= col("__n")).as("within_bound"))
  }
}
