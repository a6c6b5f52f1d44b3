package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.ops.{DedupOps, GraphOps}

/** Continuous near-dup-gated ingest — the loop a crawl pipeline runs
  * forever: each document micro-batch is checked against the bucketed
  * fingerprint store ([[DedupOps.incrementalPairs]] — corpus side
  * Exchange-free, never re-signatured), cleaned of its own internal
  * near-dup clusters (one survivor per component, the dedup_clusters
  * policy), and the survivors' fingerprints are folded back into the
  * store ([[DedupOps.appendToFingerprintStore]]) so the NEXT batch
  * dedups against them too.
  *
  * The per-batch step is a plain batch function ([[ingestBatch]]) so the
  * same code serves backfills and tests; [[streamIngest]] lifts it into
  * Structured Streaming via `foreachBatch` — the standard shape for
  * streaming writes that need multi-table transactional-ish side
  * effects.
  */
object IngestOps {

  /** Gate one batch against the store and itself.
    *
    * Returns the batch annotated with each doc's fate:
    *  - `kept`      — novel; its fingerprints were appended to the store;
    *  - `dup_store` — near-dup (verified jaccard ≥ `threshold`) of stored
    *    doc `match_id`;
    *  - `dup_batch` — near-dup of surviving batch doc `match_id` (cluster
    *    representative = min id of its within-batch component).
    *
    * Docs are judged against the store AS OF the batch start: a batch
    * doc rejected within-batch never blocks a store match of another,
    * and the append happens once, after both gates.
    *
    * CONTRACT: doc ids are IMMUTABLE once ingested. The replay guard
    * below filters appends by id, so re-submitting a CHANGED document
    * under an id the store has already seen is annotated `kept` (the
    * store gate skips identity matches) but its new fingerprints are
    * NOT appended — later batches would dedup against the original
    * signature. Ingest edited documents under fresh ids (a version
    * suffix in the id space), or rebuild the store; an in-place update
    * path would need signature-aware guards and is out of scope for the
    * append-only crawl-ingest shape this operator models. */
  def ingestBatch(batch: DataFrame, spark: SparkSession,
                  bandsTable: String, setsTable: String,
                  threshold: Double = 0.7,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val storeDup = DedupOps
      .incrementalPairs(batch, spark, bandsTable, setsTable, idCol, textCol)
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id_new").as(idCol))
      .agg(min("id_old").as("store_match"))

    val clean = batch.join(storeDup, Seq(idCol), "left_anti")
    val withinPairs = DedupOps.minhashPairs(clean, idCol, textCol)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b")
    val assign = GraphOps.clusterAssign(clean, idCol, withinPairs)
    val reps = assign.groupBy("cluster_id").agg(min(idCol).as("rep"))
    val batchFate = assign.join(reps, "cluster_id")
      .select(col(idCol), col("rep"))

    // freeze the gate decisions BEFORE mutating the store: the annotated
    // frame lazily re-reads the store tables, so without this eager cut
    // any action after the append would re-judge the batch against the
    // store it just grew (a doc's fate must depend only on the store AS
    // OF batch start — and the CC loop shouldn't re-run per action
    // either)
    val annotated = batch
      .join(storeDup, Seq(idCol), "left")
      .join(batchFate, Seq(idCol), "left")
      .select(col(idCol), col(textCol),
        when(col("store_match").isNotNull, lit("dup_store"))
          .when(col("rep") =!= col(idCol), lit("dup_batch"))
          .otherwise(lit("kept")).as("status"),
        when(col("store_match").isNotNull, col("store_match"))
          .when(col("rep") =!= col(idCol), col("rep"))
          .as("match_id"))
      .localCheckpoint(true)

    // replay guard: foreachBatch redelivers a whole batch after a crash
    // between the append and the checkpoint commit. The judging above is
    // replay-STABLE in verdict and match target (the store gate skips
    // identity matches, so a previously-kept doc is kept again; a
    // within-batch dup re-reports as dup_store of the same survivor,
    // whose fingerprints landed on the first attempt) — but the append
    // must not land its fingerprints twice. Ids already in the store
    // are filtered with one anti-join against the sets table's id
    // column (columnar, bucketed — no corpus re-signature), making the
    // whole batch step idempotent: a replay appends nothing
    // (IngestSpec pins all of this).
    val alreadyIngested = spark.table(setsTable)
      .select(col("id").as(idCol)).distinct()
    DedupOps.appendToFingerprintStore(
      annotated.filter(col("status") === "kept").select(idCol, textCol)
        .join(alreadyIngested, Seq(idCol), "left_anti"),
      spark, bandsTable, setsTable, idCol, textCol)
    annotated
  }

  /** Lift [[ingestBatch]] into a Structured Streaming sink: each
    * micro-batch is gated, appended, and handed (annotated) to `emit`.
    * `foreachBatch` serializes micro-batches, so store appends never
    * race. Caller starts/stops the returned writer (and supplies a
    * checkpoint location for exactly-once batch tracking). */
  def streamIngest(docs: DataFrame, spark: SparkSession,
                   bandsTable: String, setsTable: String,
                   threshold: Double = 0.7,
                   idCol: String = "doc_id", textCol: String = "text")(
                   emit: DataFrame => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        emit(ingestBatch(b, spark, bandsTable, setsTable, threshold,
          idCol, textCol))
      }
}
