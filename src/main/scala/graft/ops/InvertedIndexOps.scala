package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted text index — term → posting list as a TABLE,
  * the search-side sibling of the fingerprint/vector stores.
  *
  * Postings (term, doc_id) are bucketed BY TERM, so a term lookup is a
  * bucket-pruned scan: Spark's bucket pruning turns
  * `term IN (...)` into "read only the buckets those terms hash into" —
  * `SelectedBucketsCount k of n` in the plan (spec-asserted). At 100 TB
  * the index is petabyte-scale postings, a k-term query physically
  * reads ≤ k/n of it, and no shuffle touches the store: the only
  * exchange in a search is the per-doc AND-count over the (tiny)
  * matching postings.
  *
  * Ingest is the store-family pattern: new documents' postings append
  * into the SAME bucket layout ([[LayoutOps.appendBucketed]] re-states
  * the catalog's bucket spec, so the pruning property survives any
  * number of appends); the existing index is never rewritten.
  */
object InvertedIndexOps {

  /** One (doc_id, term) row per DISTINCT term of each doc (lowercased
    * whitespace tokens — [[DedupOps.tokens]]). */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(DedupOps.tokens(col(textCol)))).as("term"))

  /** Build the index: postings of `docs` bucketed by term at
    * `basePath`, registered as `table`. */
  def writeTextIndex(docs: DataFrame, spark: SparkSession, table: String,
                     basePath: String, nBuckets: Int = 16,
                     idCol: String = "doc_id",
                     textCol: String = "text"): Unit =
    LayoutOps.writeBucketed(postings(docs, idCol, textCol), spark,
      table, basePath, nBuckets, "term")

  /** Ingest a batch: its postings append under the same bucket spec. */
  def appendToTextIndex(batch: DataFrame, spark: SparkSession,
                        table: String, idCol: String = "doc_id",
                        textCol: String = "text"): Unit =
    LayoutOps.appendBucketed(postings(batch, idCol, textCol), spark, table)

  /** Conjunctive (AND-of-terms) search: doc_ids containing EVERY term.
    * The scan is bucket-pruned to the query terms' buckets; the AND is
    * a distinct-term count per doc over the surviving postings. */
  def searchAllTerms(spark: SparkSession, table: String,
                     terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAllTerms needs at least one term")
    // normalize like the postings themselves (DedupOps.tokens
    // lowercases) and dedup: a verbatim "Batch" would match nothing,
    // and a duplicated term would demand more distinct matches than
    // can exist — both silently empty, not errors
    val qs = terms.map(_.toLowerCase).distinct
    spark.table(table)
      .filter(col("term").isin(qs: _*))
      .groupBy("doc_id")
      .agg(countDistinct("term").as("__k"))
      .filter(col("__k") === qs.size)
      .select("doc_id")
  }
}
