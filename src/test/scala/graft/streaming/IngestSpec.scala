package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.DedupOps

/** End-to-end continuous ingest: micro-batches gated against the
  * fingerprint store, within-batch clusters collapsed to one survivor,
  * survivors appended so LATER batches dedup against them. */
case class IngestDoc(doc_id: Long, text: String)

class IngestSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed batches are gated by the store, themselves, and earlier batches") {
    val base = java.nio.file.Files.createTempDirectory("ingest").toString
    val corpus = spark.read.parquet(s"$sfSmall/documents.parquet")
      .select("doc_id", "text")
    DedupOps.writeFingerprintStore(corpus, spark,
      "ingest_bands", "ingest_sets", base)

    val storedText = corpus.filter($"doc_id" === 7L)
      .head().getString(1)
    val novelA = "graft ingest novel document alpha " +
      (1 to 40).map(i => s"alphatok$i").mkString(" ")
    val novelB = "graft ingest novel document beta " +
      (1 to 40).map(i => s"betatok$i").mkString(" ")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestDoc]
    val results = scala.collection.mutable.Map[Long, (String, Option[Long])]()
    val writer = IngestOps.streamIngest(input.toDF(), spark,
      "ingest_bands", "ingest_sets") { annotated =>
      annotated.collect().foreach { r =>
        results(r.getLong(0)) = (r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }
    }
    val q = writer.start()
    try {
      // batch 1: a store dup, a novel doc, and a near-copy of that novel
      // doc (same batch → one survivor)
      input.addData(
        IngestDoc(1000001L, storedText),
        IngestDoc(1000002L, novelA),
        IngestDoc(1000003L, novelA + " tail"))
      q.processAllAvailable()
      // batch 2: a near-copy of batch 1's survivor (proves the append),
      // plus a fresh novel doc
      input.addData(
        IngestDoc(1000004L, novelA + " later"),
        IngestDoc(1000005L, novelB))
      q.processAllAvailable()
    } finally q.stop()

    // identical text to doc 7 → verified jaccard 1.0; match_id is the
    // MIN matching store id (doc 7 itself unless 7 has a smaller-id
    // store near-dup, which also counts)
    assert(results(1000001L)._1 == "dup_store" &&
      results(1000001L)._2.nonEmpty, results(1000001L))
    assert(results(1000002L) == ("kept", None))
    assert(results(1000003L) == ("dup_batch", Some(1000002L)))
    assert(results(1000004L)._1 == "dup_store" &&
      results(1000004L)._2.contains(1000002L),
      s"batch-2 doc should hit batch-1's appended survivor: ${results(1000004L)}")
    assert(results(1000005L) == ("kept", None))

    // the store grew by exactly the two kept docs' shingle sets
    val n = spark.table("ingest_sets")
      .filter($"id" >= 1000000L).select("id").distinct().count()
    assert(n == 2L, s"expected 2 appended docs, got $n")
    spark.sql("DROP TABLE IF EXISTS ingest_bands")
    spark.sql("DROP TABLE IF EXISTS ingest_sets")
  }

  test("a replayed micro-batch re-annotates identically and appends " +
    "nothing (foreachBatch crash-redelivery)") {
    val base = java.nio.file.Files.createTempDirectory("ingest-rp").toString
    val corpus = spark.read.parquet(s"$sfSmall/documents.parquet")
      .select("doc_id", "text")
    DedupOps.writeFingerprintStore(corpus, spark,
      "ingrp_bands", "ingrp_sets", base)
    try {
      val storedText = corpus.filter($"doc_id" === 7L).head().getString(1)
      val novel = "graft replay novel document " +
        (1 to 40).map(i => s"rptok$i").mkString(" ")
      val batch = Seq(
        IngestDoc(2000001L, storedText),       // dup of the store
        IngestDoc(2000002L, novel),            // kept
        IngestDoc(2000003L, novel + " tail"))  // dup of the batch survivor
        .toDF()
      def fates(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> (r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      def storeRows() = (
        spark.table("ingrp_sets").filter($"id" >= 2000000L).count(),
        spark.table("ingrp_bands").filter($"id" >= 2000000L).count())

      val first = fates(IngestOps.ingestBatch(batch, spark,
        "ingrp_bands", "ingrp_sets"))
      val afterFirst = storeRows()
      assert(first(2000002L) == ("kept", None))
      assert(afterFirst._1 > 0 && afterFirst._2 > 0)

      // the crash-redelivery: the SAME batch runs again. Verdicts and
      // match targets must not move; the one legitimate drift is
      // provenance — a within-batch dup now matches its survivor
      // THROUGH THE STORE (the survivor's fingerprints landed on the
      // first attempt), so dup_batch may re-report as dup_store with
      // the same match_id.
      val replay = fates(IngestOps.ingestBatch(batch, spark,
        "ingrp_bands", "ingrp_sets"))
      assert(replay.keySet == first.keySet)
      replay.foreach { case (id, (status, m)) =>
        val (s0, m0) = first(id)
        assert((status == "kept") == (s0 == "kept") && m == m0,
          s"doc $id changed verdict on replay: ($status,$m) vs ($s0,$m0)")
      }
      assert(replay(2000003L) == ("dup_store", Some(2000002L)),
        "the batch-dup's replay match arrives via the store")
      assert(storeRows() == afterFirst,
        "replay must append nothing — not one duplicate fingerprint row")

      // and a LATER batch still dedups against the survivor exactly once
      val later = fates(IngestOps.ingestBatch(
        Seq(IngestDoc(2000004L, novel + " later")).toDF(), spark,
        "ingrp_bands", "ingrp_sets"))
      assert(later(2000004L)._1 == "dup_store" &&
        later(2000004L)._2.contains(2000002L), later(2000004L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS ingrp_bands")
      spark.sql("DROP TABLE IF EXISTS ingrp_sets")
    }
  }
}
