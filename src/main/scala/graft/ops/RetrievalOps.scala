package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for multi-retriever search — the glue of hybrid (sparse
  * + dense) retrieval: each retriever contributes only its RANKS, so
  * incomparable score scales (BM25 vs cosine) never need calibrating.
  *
  * Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR'09 — public
  * literature): fused(d) = Σ_r 1/(k + rank_r(d)). Computed here in
  * FIXED POINT — each contribution is `round(10⁹ / (k + rank))` as a
  * long, so the per-document sum is exact integer arithmetic,
  * associativity-free, and therefore bit-replicable in any engine (a
  * float Σ would tie-break on partial-aggregation order): the same
  * oracle-able-kernel move as [[graft.expressions.Pq]]'s argmin. At
  * nano-reciprocal resolution the rounding can only reorder documents
  * whose float RRF scores agree to ~10⁻⁹ relative — ties RRF itself
  * ranks arbitrarily.
  *
  * Plan shape: union of the (already top-k-bounded) rank lists →
  * one hash aggregation on (query, doc) → per-query window (rank ≤ k
  * runs through WindowGroupLimit, capping every group pre-shuffle).
  * Nothing here touches a corpus — inputs are retriever OUTPUTS, so
  * the fusion costs queries × k rows per retriever at any data scale.
  */
object RetrievalOps {

  /** Fuse rank lists `(query_id, doc_id, rank)` (1-based ranks, as
    * every searcher here emits). Output: per-query fused top-k with
    * `rrf_pts` (the fixed-point score) and `n_lists` (how many
    * retrievers surfaced the doc — the agreement signal re-rankers
    * weight). */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val pts = rankings.map(_.select(col("query_id"), col("doc_id"),
        round(lit(1e9) / (lit(k) + col("rank"))).cast("long").as("__pts")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy("query_id")
      .orderBy(desc("rrf_pts"), col("doc_id"))
    pts.groupBy("query_id", "doc_id")
      .agg(sum("__pts").as("rrf_pts"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "doc_id", "rank", "rrf_pts", "n_lists")
  }
}
