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
    fuse(pts, topK)
  }

  /** Weighted RRF — the hybrid tuning knob (lexical-heavy vs
    * semantic-heavy stacks): fused(d) = Σ_r w_r / (k + rank_r(d)).
    * Weights become EXACT ppm integers (`round(w · 10⁶)`) and each
    * contribution is `wppm · round(10⁹/(k+rank))` — integer products
    * and sums, still associativity-free, so the weighted fusion stays
    * bit-replicable in any engine (a float w·pts sum would reintroduce
    * the partial-agg-order tie-break RRF's fixed point removed). Scores
    * are 10⁶× [[rrfFuse]]'s scale; at all-1 weights the RANKING is
    * identical to rrfFuse's (spec-pinned). */
  def rrfFuseWeighted(rankings: Seq[(DataFrame, Double)], topK: Int,
                      k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuseWeighted needs at least one ranking")
    require(rankings.forall(_._2 > 0), "retriever weights must be positive")
    val pts = rankings.map { case (r, weight) =>
      val wppm = math.round(weight * 1e6)
      r.select(col("query_id"), col("doc_id"),
        (lit(wppm) * round(lit(1e9) / (lit(k) + col("rank"))).cast("long"))
          .as("__pts"))
    }.reduce(_ unionByName _)
    fuse(pts, topK)
  }

  /** Shared tail: per-(query, doc) integer point sum → per-query top-k
    * (rank ≤ k runs through WindowGroupLimit, capping groups
    * pre-shuffle). */
  private def fuse(pts: DataFrame, topK: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(desc("rrf_pts"), col("doc_id"))
    pts.groupBy("query_id", "doc_id")
      .agg(sum("__pts").as("rrf_pts"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "doc_id", "rank", "rrf_pts", "n_lists")
  }
}
