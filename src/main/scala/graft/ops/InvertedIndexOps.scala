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
  *
  * Durability contract (vs the manifest-committed vector/join stores):
  * appends ride Spark's file-commit protocol, so a FAILED append leaves
  * nothing visible — but there is no replay tag, so a SUCCEEDED batch
  * re-submitted by an at-least-once orchestrator lands twice
  * (duplicate postings, double tf). Idempotence is the caller's:
  * dedupe batches upstream, or route document ingest through
  * [[graft.streaming.IngestOps]] whose fingerprint-store guard is
  * replay-safe.
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

  // ------------------------------------------------- BM25 ranked search

  /** Scored postings: one (doc_id, term, tf, dlen) row per DISTINCT
    * term of each doc — `tf` the term's in-doc count, `dlen` the doc's
    * total token count DENORMALIZED onto every posting row. The
    * denormalization is the scale call: BM25's length norm needs dlen
    * next to tf at score time, and a doc-length side table would put a
    * data-sized join on every query; one long column on the postings
    * costs ~8 bytes/row instead. */
  def scoredPostings(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      DedupOps.tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dlen"),
        explode(col("__t")).as("term"))
      .groupBy("doc_id", "term", "dlen")
      .agg(count(lit(1)).as("tf"))

  /** Build the ranked index: scored postings bucketed by term at
    * `basePath`, plus an append-only one-row-per-commit corpus-stats
    * table `<table>_stats` (n_docs, sum_dlen) — readers SUM it, so an
    * append never rewrites anything and the stats stay exact under any
    * number of ingest batches. */
  def writeScoredIndex(docs: DataFrame, spark: SparkSession, table: String,
                       basePath: String, nBuckets: Int = 16,
                       idCol: String = "doc_id",
                       textCol: String = "text"): Unit = {
    LayoutOps.writeBucketed(scoredPostings(docs, idCol, textCol), spark,
      table, s"$basePath/postings", nBuckets, "term")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_stats")
    corpusStats(docs, idCol, textCol)
      .write.mode("overwrite").option("path", s"$basePath/stats")
      .saveAsTable(s"${table}_stats")
  }

  /** Ingest a batch into the ranked index: postings append under the
    * existing bucket spec; one stats row appends beside them. */
  def appendToScoredIndex(batch: DataFrame, spark: SparkSession,
                          table: String, idCol: String = "doc_id",
                          textCol: String = "text"): Unit = {
    LayoutOps.appendBucketed(scoredPostings(batch, idCol, textCol), spark,
      table)
    corpusStats(batch, idCol, textCol)
      .write.mode("append").saveAsTable(s"${table}_stats")
  }

  private def corpusStats(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(size(DedupOps.tokens(col(textCol))).cast("long")),
        lit(0L)).as("sum_dlen"))

  /** BM25 top-k: the disjunctive ranked-retrieval twin of
    * [[searchAllTerms]]. The postings scan is bucket-pruned to the
    * query terms; document frequency comes off that same pruned scan
    * (df(t) = posting count of t — exact, no stored df to maintain);
    * corpus stats are a broadcast one-row aggregate of the stats table.
    * So the only data-sized work is one pruned scan + one groupBy on
    * the surviving postings — candidate volume is the query terms'
    * posting mass, never the corpus.
    *
    * Scoring is Robertson/Lucene BM25:
    * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`, contribution
    * `idf · tf·(k1+1) / (tf + k1·(1 − b + b·dlen/avgdl))`. Contributions
    * round to 6 decimals and the summed score to 4 — wide enough to
    * absorb last-ulp libm `ln` divergence across engines, tight enough
    * that the driver's hash compare pins every df/tf/dlen/avgdl input
    * exactly ([[graft.queries.TextOps]] `text_bm25`). */
  def searchBm25(spark: SparkSession, table: String, terms: Seq[String],
                 topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "searchBm25 needs at least one term")
    val qs = terms.map(_.toLowerCase).distinct.filter(_.nonEmpty)
    val posts = spark.table(table).filter(col("term").isin(qs: _*))
    val dfreq = posts.groupBy("term").agg(count(lit(1)).as("df"))
    val st = spark.table(s"${table}_stats")
      .agg(sum("n_docs").as("n"), sum("sum_dlen").as("sd"))
    posts.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(st))
      .withColumn("__avgdl",
        col("sd").cast("double") / col("n").cast("double"))
      .withColumn("__idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("__c",
        round(col("__idf") * ((col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + (lit(b) * col("dlen")) / col("__avgdl")))), 6))
      .groupBy("doc_id")
      .agg(round(sum("__c"), 4).as("score"),
        count(lit(1)).as("matched"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(topK)
  }

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
