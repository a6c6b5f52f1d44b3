package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted text index — term → posting list as a TABLE,
  * the search-side sibling of the fingerprint/vector stores.
  *
  * == One posting layout, every search kind ==
  *
  * A posting row is `(term, doc_id, tf, dlen, positions, __batch)` —
  * one row per DISTINCT term of each doc, carrying that term's in-doc
  * count (`tf`), the doc's total token count (`dlen`, denormalized so
  * BM25's length norm needs no doc-length join at score time) and the
  * term's sorted 1-based occurrence positions. ONE ingest serves all
  * four search kinds: containment ([[searchAllTerms]]) and BM25
  * ([[searchBm25]]/[[searchBm25Batch]]) read (term, doc_id, tf, dlen);
  * exact phrase ([[searchPhrase]]) and proximity
  * ([[searchPhraseWindow]]) explode `positions`. Parquet is columnar,
  * so each search physically reads only its columns — BM25 never pays
  * for the positions a phrase query needs, and a hybrid stack
  * (`hybrid_rrf3`) builds ONE index where it used to build two, with
  * one ledger, one doc sidecar and half the tokenization.
  *
  * Postings are bucketed BY TERM, so a term lookup is a bucket-pruned
  * scan: Spark's bucket pruning turns `term IN (...)` into "read only
  * the buckets those terms hash into" — `SelectedBucketsCount k of n`
  * in the plan (spec-asserted). At 100 TB the index is petabyte-scale
  * postings, a k-term query physically reads ≤ k/n of it, and no
  * shuffle touches the store: the only exchange in a search is the
  * per-doc AND-count over the (tiny) matching postings.
  *
  * Beside the postings, the `<table>_terms` sidecar keeps one
  * (term, df, max_tf, min_dlen, __batch) row per (term, ingest batch) —
  * the per-term score-upper-bound statistics [[searchBm25Batch]]'s
  * WAND-style pruning reads (see its doc); committed by the same
  * ledger row as the postings, maintained through append (a new row
  * per batch), delete (untouched: bounds stay valid upper bounds —
  * the deleted-doc mass is subtracted via the ledger) and rebuild
  * (untouched: live values can only shrink under the stored bounds).
  *
  * Ingest is the store-family pattern: new documents' postings append
  * into the SAME bucket layout ([[LayoutOps.appendBucketed]] re-states
  * the catalog's bucket spec, so the pruning property survives any
  * number of appends); the existing index is never rewritten.
  *
  * == Durability contract (the store-family commit ledger) ==
  *
  * Every posting row carries the opaque physical tag (`__batch`) of the
  * ingest that wrote it, and the per-index `<table>_stats` ledger holds
  * ONE row per committed ingest: `(batch_tag, logical_tag, n_docs,
  * sum_dlen)`. The ledger row is written LAST, as its own single-job
  * append — it IS the commit point, exactly the manifest-borne marker
  * role of [[VectorStoreOps]]' commit dirs:
  *
  *  - ATOMIC VISIBILITY: readers semi-join postings on committed
  *    `batch_tag`s (a broadcast of the tiny ledger), so a crash between
  *    the postings append and the ledger append leaves the torn batch's
  *    rows PHYSICALLY present but INVISIBLE — never half a batch, and
  *    never postings whose tf/df mass is missing from the corpus stats.
  *  - REPLAY IDEMPOTENCE: callers pass a stable `batchTag`; an append
  *    whose logical tag already sits in the ledger is a no-op, so an
  *    at-least-once orchestrator redelivering a SUCCEEDED batch lands
  *    nothing twice (doubled tf/df/stats was the failure mode). A
  *    redelivery after a TORN attempt re-runs under a fresh physical
  *    tag; the torn rows stay uncommitted forever (vacuum candidates —
  *    a compacting rebuild through [[writeScoredIndex]] drops them).
  *  - Doc ids are IMMUTABLE once ingested (the [[graft.streaming
  *    .IngestOps]] contract): the guard covers redelivery of the same
  *    batch, not re-ingesting a changed document under an old id.
  *
  * == Compliance delete (right-to-be-forgotten) ==
  *
  * [[deleteFromTextIndex]] tombstones doc ids: searches anti-join the
  * (committed) tombstone set, df comes off the already-filtered pruned
  * scan, and one NEGATIVE ledger row retracts the deleted docs'
  * (n_docs, sum_dlen) mass — so post-delete BM25 equals a from-scratch
  * index over the survivors (gate query `text_bm25_del`). Postings
  * linger physically until a rebuild reclaims them, the same
  * linger-then-rebuild trade as the fingerprint store's tombstones.
  * The tombstone table itself is LAZY — created by the first delete —
  * so a never-deleted index pays no tombstone join on any search and
  * no side-table write at build time.
  *
  * The retraction reads the `<table>_docs` SIDECAR (one (doc_id, dlen,
  * __batch) row per ingested doc, bucketed BY DOC ID, committed by the
  * same ledger row as its postings): an RTBF batch is request-sized —
  * its ids push down as an `IN` on the id-bucketed sidecar — and never
  * touches the postings, which are bucketed by term and would cost a
  * corpus-sized column scan (the pre-r14 shape). The sidecar also
  * carries zero-token docs (postings can't), so THEIR n_docs mass
  * retracts correctly too.
  *
  * == Single writer ==
  *
  * The replay guard is check-then-act (ledger read, postings append,
  * ledger append): it makes SEQUENTIAL redelivery idempotent, not
  * CONCURRENT duplicate delivery — two simultaneous submissions of one
  * batch tag can both pass the check and both commit. One writer per
  * index at a time, the same contract as the agg/join/vector stores
  * (whose manifest appends assume it too).
  *
  * Concurrent-catalog note: one mutation's independent side-table
  * writes are submitted from a small thread pool (graft.util.Par — the
  * overlap-independent-jobs pattern), so a single ingest/delete can
  * issue catalog calls from two threads at once. The tested local
  * metastore serializes them fine; a deployment against a shared HMS
  * whose client chokes on concurrent DDL from one application should
  * drop the Par wrappers (the writes are correct sequentially — the
  * ordering contract is only "ledger LAST", which both shapes keep).
  *
  * == Reader vs maintenance ==
  *
  * Time travel ([[searchBm25]] `asOfSeq`) reads through a committed
  * ledger prefix; REBUILD is this store's vacuum and collapses that
  * history. The retention rule: schedule rebuilds so the newest
  * barrier is older than the longest reader window — an as-of read
  * that races a rebuild either answers exactly (its rows still live)
  * or fails loudly at the barrier check / with a missing-file task
  * error; there is no path from "rows reclaimed" to "different rows
  * returned", because visibility is ledger-resolved, never inferred
  * from what happens to be on disk.
  *
  * Durability contract of record: `graft.ops.StoreContractSpec` —
  * the cross-family property suite every persisted store passes
  * (replay no-op, torn-write invisibility, RTBF permanence through
  * rebuild + replay, rebuild answer-preservation, loud
  * reader-vs-maintenance boundaries).
  */
object InvertedIndexOps {

  private val StatsCols =
    Seq("batch_tag", "logical_tag", "n_docs", "sum_dlen", "seq")

  /** The logical tag of a rebuild's history-collapse barrier row (see
    * [[rebuildTextIndex]]): as-of reads older than the newest barrier
    * fail loudly — the rebuild physically reclaimed the rows such a
    * read would need. */
  private val RebuildBarrier = "__rebuild__"

  /** Fresh physical tag for one write ATTEMPT. Replays of the same
    * logical batch get distinct physical tags, so a torn attempt's rows
    * can never be retroactively committed by the retry's ledger row. */
  private def physicalTag(logical: Option[String]): String =
    s"${logical.getOrElse("adhoc")}#${java.util.UUID.randomUUID()}"

  /** ONE tiny ledger read per mutation: (already committed?, next seq).
    * The replay short-circuit and the seq allocation used to be two
    * separate reads; the ledger is one row per batch, so folding them
    * saves a driver job on every ingest. Single-writer makes the
    * read-then-append race-free (class doc). */
  private def ledgerProbe(spark: SparkSession, table: String,
                          logical: Option[String]): (Boolean, Long) = {
    val r = spark.table(s"${table}_stats")
      .agg(coalesce(max("seq"), lit(0L)),
        coalesce(max(when(col("logical_tag") === lit(logical.orNull), 1)
          .otherwise(0)), lit(0))).head()
    (logical.isDefined && r.getInt(1) == 1, r.getLong(0) + 1L)
  }

  /** Broadcastable set of committed physical tags (the ledger's
    * `batch_tag` column) — the visibility filter for postings AND
    * tombstones. `asOfSeq` restricts it to the ledger PREFIX up to that
    * commit — the whole time-travel mechanism: everything the index
    * serves is visibility-joined through this set, so filtering one
    * tiny broadcast rolls searches back to any committed point. */
  private def committedTags(spark: SparkSession, table: String,
                            asOfSeq: Option[Long] = None): DataFrame = {
    val led = spark.table(s"${table}_stats")
    asOfSeq.fold(led)(n => led.filter(col("seq") <= n))
      .select("batch_tag").distinct()
  }

  private def tombTable(table: String) = s"${table}_tombstones"

  /** Cap on the literal visibility IN-filter: ledgers are one row per
    * batch, so almost every index sits far under it; past the cap the
    * filter degrades to the broadcast semi-join (correctness identical,
    * no driver-side literal list of unbounded size). */
  private val maxPushedTags = 1024

  /** Restrict `df` to committed batches — as a PUSHABLE literal
    * `IN (tags...)` predicate when the ledger is small (the common
    * case): the filter reaches the parquet scan, where per-file min/max
    * statistics skip every file of an uncommitted, torn or post-`asOfSeq`
    * batch outright — each data file is written by exactly one batch, so
    * its `__batch` min = max = that tag (guide §6 file skipping with no
    * layout change), and every search runs one broadcast build fewer
    * (the tag collect is a driver job of the same ledger-bounded size
    * the broadcast build was). Past [[maxPushedTags]] it degrades to
    * the broadcast semi-join. */
  private def withCommitted(df: DataFrame, spark: SparkSession,
                            table: String,
                            asOfSeq: Option[Long]): DataFrame = {
    val tags = committedTags(spark, table, asOfSeq)
      .limit(maxPushedTags + 1).collect().map(_.getString(0))
    if (tags.length <= maxPushedTags)
      df.filter(col("__batch").isin(tags.toIndexedSeq: _*))
    else df.join(broadcast(committedTags(spark, table, asOfSeq)),
      col("__batch") === col("batch_tag"), "left_semi")
  }

  /** Committed tombstoned doc ids (only meaningful once the tombstone
    * table exists — see [[minusTombstones]]). */
  private def committedTombstones(spark: SparkSession, table: String,
                                  asOfSeq: Option[Long] = None): DataFrame =
    withCommitted(spark.table(tombTable(table)), spark, table, asOfSeq)
      .select("doc_id")

  /** Anti-join `df` against the committed tombstones — skipped WHOLE
    * when the index has never seen a delete: the tombstone table is
    * created lazily by the first [[deleteFromTextIndex]], so a
    * never-deleted store's searches carry no tombstone join at all
    * (one broadcast stage fewer on every query, one side table fewer
    * on every build). */
  private def minusTombstones(df: DataFrame, spark: SparkSession,
                              table: String,
                              asOfSeq: Option[Long] = None): DataFrame =
    if (!spark.catalog.tableExists(tombTable(table))) df
    else df.join(broadcast(committedTombstones(spark, table, asOfSeq)),
      Seq("doc_id"), "left_anti")

  /** Live postings under `pred`: the pruned scan, restricted to
    * committed batches, minus tombstoned docs. `pred` lands directly on
    * the table scan, so bucket pruning on `term` is untouched; the
    * visibility filter is a pushed `IN` predicate ([[withCommitted]] —
    * post-asOf batches' files are skipped at the scan). */
  private def livePostings(spark: SparkSession, table: String,
                           pred: Column,
                           asOfSeq: Option[Long] = None): DataFrame =
    minusTombstones(
      withCommitted(spark.table(table).filter(pred), spark, table, asOfSeq),
      spark, table, asOfSeq)

  /** Append one ledger row (the commit point) at `seq` — callers get
    * the slot from [[ledgerProbe]] (one read per mutation); the
    * single-writer contract makes read-then-append race-free.
    * `nDocs`/`sumDlen` may be negative (delete). */
  private def commitLedger(spark: SparkSession, table: String, tag: String,
                           logical: Option[String], nDocs: Long,
                           sumDlen: Long, seq: Long, overwrite: Boolean,
                           basePath: Option[String] = None): Unit = {
    import spark.implicits._
    val w = Seq((tag, logical.orNull, nDocs, sumDlen, seq))
      .toDF(StatsCols: _*).coalesce(1).write
    if (overwrite) {
      spark.sql(s"DROP TABLE IF EXISTS ${table}_stats")
      w.mode("overwrite").option("path", s"${basePath.get}/stats")
        .saveAsTable(s"${table}_stats")
    } else w.mode("append").saveAsTable(s"${table}_stats")
  }

  /** Newest committed ledger seq — the value to remember before a
    * mutation if you want to [[searchBm25]] `asOfSeq` it later. */
  def currentLedgerSeq(spark: SparkSession, table: String): Long =
    spark.table(s"${table}_stats")
      .agg(coalesce(max("seq"), lit(0L))).head().getLong(0)

  /** As-of reads must not predate the newest rebuild barrier: the
    * rebuild physically reclaimed tombstoned/torn rows, so an older
    * snapshot is unanswerable — loudly, never approximately. */
  private def requireAsOfReadable(spark: SparkSession, table: String,
                                  asOfSeq: Option[Long]): Unit =
    asOfSeq.foreach { n =>
      val r = spark.table(s"${table}_stats")
        .agg(coalesce(max("seq"), lit(0L)),
          coalesce(max(when(col("logical_tag") === RebuildBarrier,
            col("seq"))), lit(0L))).head()
      val (maxSeq, barrier) = (r.getLong(0), r.getLong(1))
      require(n >= 1 && n <= maxSeq,
        s"asOfSeq $n out of range: index '$table' has commits 1..$maxSeq")
      require(n >= barrier,
        s"asOfSeq $n predates the last rebuild (barrier seq $barrier) of " +
          s"index '$table' — the rebuild reclaimed the rows that read " +
          "would need; keep pre-rebuild snapshots elsewhere if older " +
          "reads must stay alive")
    }

  private def docsTable(table: String) = s"${table}_docs"

  /** Format-migration guard: delete and rebuild read the `<table>_docs`
    * sidecar, which indexes persisted before r14's sidecar format don't
    * have — fail with the migration story, not a bare
    * TABLE_OR_VIEW_NOT_FOUND. */
  private def requireSidecar(spark: SparkSession, table: String,
                             op: String): Unit =
    require(spark.catalog.tableExists(docsTable(table)),
      s"$op: text index '$table' has no '${docsTable(table)}' doc sidecar " +
        "— a pre-sidecar index. Re-seed it (writeTextIndex/" +
        "writeScoredIndex/writePositionalIndex writes the sidecar) or " +
        "backfill one (doc_id, dlen, __batch) row per ingested doc, " +
        "bucketed by doc_id, reusing each doc's committed batch tag.")

  /** The doc sidecar frame of one batch: (doc_id, dlen, __batch), one
    * row per doc INCLUDING zero-token ones — the id-keyed view of the
    * ingest that makes an RTBF batch-sized (see the class doc). Also
    * the source of the batch's ledger stats: count(rows) = n_docs,
    * sum(dlen) = sum_dlen, so ingest tokenizes twice (postings +
    * sidecar), not three times.
    *
    * Measured note (r16): deriving this frame from the just-written
    * postings instead (groupBy(doc_id).max(dlen) + an outer join for
    * zero-token ids) was tried and REVERTED — the narrow-row
    * shuffle+join machinery cost ~50% more process cpu than the
    * map-only second tokenization it replaced at bench scale
    * (text_search cpu 13.8 → 21.7 s), and it serializes the ingest's
    * two independent write chains behind the postings write. */
  private def docSidecar(docs: DataFrame, idCol: String, textCol: String,
                         tag: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(DedupOps.tokens(col(textCol))).cast("long").as("dlen"),
      lit(tag).as("__batch"))

  /** Write the sidecar (seed) / append a batch, then return the ledger
    * stats OF that frame — the shared tail of every write and append. */
  private def putSidecar(docs: DataFrame, spark: SparkSession,
                         table: String, idCol: String, textCol: String,
                         tag: String, seedPath: Option[String],
                         nBuckets: Int = 16): (Long, Long) = {
    // lazy cache, not an eager checkpoint: the write materializes the
    // cache and the stats agg reads it — two jobs, no extra
    // materialization job on the ingest path
    val side = docSidecar(docs, idCol, textCol, tag).persist()
    seedPath match {
      case Some(base) => LayoutOps.writeBucketed(side, spark,
        docsTable(table), s"$base/docs", nBuckets, "doc_id")
      case None => LayoutOps.appendBucketed(side, spark, docsTable(table))
    }
    val st = side.agg(count(lit(1)).as("n_docs"),
      coalesce(sum("dlen"), lit(0L)).as("sum_dlen")).head()
    side.unpersist()
    (st.getLong(0), st.getLong(1))
  }

  /** One (doc_id, term) row per DISTINCT term of each doc (lowercased
    * whitespace tokens — [[DedupOps.tokens]]). Derivation helper (spec
    * oracles); the persisted layout is [[unifiedPostings]]. */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(DedupOps.tokens(col(textCol)))).as("term"))

  /** THE persisted posting layout: one (doc_id, term, tf, dlen,
    * positions) row per DISTINCT term of each doc — `tf` the term's
    * in-doc count, `dlen` the doc's total token count denormalized onto
    * every row (BM25's length norm needs it next to tf; a doc-length
    * side table would put a data-sized join on every query), and
    * `positions` the term's sorted 1-based occurrence positions
    * (bounded by the doc's own token count — the collect_list groups by
    * (doc, term), never anything corpus-sized). */
  def unifiedPostings(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      DedupOps.tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dlen"),
        posexplode(col("__t")))
      .select(col("doc_id"), col("dlen"), col("col").as("term"),
        (col("pos") + 1).cast("long").as("pos"))
      .groupBy("doc_id", "term", "dlen")
      .agg(count(lit(1)).as("tf"),
        array_sort(collect_list(col("pos"))).as("positions")) // bounded: the doc's own occurrences of one term
      .select("doc_id", "term", "tf", "dlen", "positions")

  private def termsTable(table: String) = s"${table}_terms"

  /** One batch's term-statistics rows: per term, its document frequency
    * within the batch and the batch's extreme (max tf, min dlen) over
    * that term's postings — the ingredients of a per-term score upper
    * bound that stays VALID (never tight, never wrong) under deletes
    * and rebuilds: live df can only be ≤ the committed sum, live max tf
    * ≤ the committed max, live min dlen ≥ the committed min. */
  private def termStats(posts: DataFrame, tag: String): DataFrame =
    posts.groupBy("term")
      .agg(count(lit(1)).as("df"), max("tf").as("max_tf"),
        min("dlen").as("min_dlen"))
      .withColumn("__batch", lit(tag))

  /** Build the index at `basePath`: unified postings bucketed by term,
    * the `<table>_terms` statistics sidecar, the `<table>_docs` RTBF
    * sidecar, the tombstone table, and the commit ledger (written LAST
    * — the atomic commit point for all four). */
  def writeTextIndex(docs: DataFrame, spark: SparkSession, table: String,
                     basePath: String, nBuckets: Int = 16,
                     idCol: String = "doc_id",
                     textCol: String = "text"): Unit = {
    val tag = physicalTag(Some("seed"))
    val posts = unifiedPostings(docs, idCol, textCol)
      .withColumn("__batch", lit(tag))
    // a prior index at this TABLE NAME may have left a tombstone table;
    // a re-seed starts with a clean slate (no lingering tombstones —
    // the table reappears lazily on the first delete). The FILES go
    // too: the lazy table is external (under this base), and a stale
    // dir would otherwise resurface as tombstones on the next delete.
    spark.sql(s"DROP TABLE IF EXISTS ${tombTable(table)}")
    new org.apache.hadoop.fs.Path(s"$basePath/tombstones")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(s"$basePath/tombstones"), true)
    // two independent write chains, submitted concurrently (the doc
    // sidecar never reads the postings and vice versa; the ledger — the
    // one commit point for all three tables — still lands once, LAST):
    //  - postings, then term stats off the just-written table (three
    //    columns, columnar) rather than re-tokenizing or persisting the
    //    posting frame — on a seed the whole table IS the batch;
    //  - the doc sidecar, whose aggregate also yields the ledger stats.
    var stats: (Long, Long) = null
    graft.util.Par.run(
      () => {
        LayoutOps.writeBucketed(posts, spark, table, s"$basePath/postings",
          nBuckets, "term")
        LayoutOps.writeBucketed(
          termStats(spark.table(table), tag), spark,
          termsTable(table), s"$basePath/terms", nBuckets, "term")
      },
      () => stats = putSidecar(docs, spark, table, idCol, textCol, tag,
        Some(basePath), nBuckets))
    commitLedger(spark, table, tag, Some("seed"), stats._1, stats._2,
      seq = 1L, overwrite = true, basePath = Some(basePath))
  }

  /** Ingest a batch: its postings and term stats append under the same
    * bucket specs, then one ledger row commits them both. `batchTag` is
    * the caller's stable batch identity — pass it and redeliveries are
    * no-ops. */
  def appendToTextIndex(batch: DataFrame, spark: SparkSession,
                        table: String, idCol: String = "doc_id",
                        textCol: String = "text",
                        batchTag: Option[String] = None): Unit = {
    val (alreadyCommitted, seq) = ledgerProbe(spark, table, batchTag)
    if (alreadyCommitted) return
    val tag = physicalTag(batchTag)
    val posts = unifiedPostings(batch, idCol, textCol)
      .withColumn("__batch", lit(tag))
    // three INDEPENDENT batch-derived appends (postings, term stats
    // recomputed from the delta — two passes over a batch beat pinning
    // corpus-scale blocks on the ingest path — and the doc sidecar),
    // submitted concurrently; the ledger row, the single commit point
    // for all three, lands once and LAST as before
    var stats: (Long, Long) = null
    graft.util.Par.run(
      () => LayoutOps.appendBucketed(posts, spark, table),
      () => LayoutOps.appendBucketed(termStats(
        unifiedPostings(batch, idCol, textCol).withColumn("__batch", lit(tag)),
        tag), spark, termsTable(table)),
      () => stats = putSidecar(batch, spark, table, idCol, textCol, tag, None))
    commitLedger(spark, table, tag, batchTag, stats._1, stats._2, seq,
      overwrite = false)
  }

  // ---------------------------------------------- positional / phrase

  /** Occurrence-level view: one (doc_id, term, pos) row per token
    * OCCURRENCE (1-based) — what the phrase searches consume, derived
    * by exploding the unified rows' `positions` (derivation helper for
    * spec oracles; nothing persists this shape anymore). */
  def positionalPostings(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(DedupOps.tokens(col(textCol))))
      .select(col("doc_id"), col("col").as("term"),
        (col("pos") + 1).cast("long").as("pos"))

  /** Alias of [[writeTextIndex]] kept for the phrase-first call sites:
    * the unified layout IS the positional index (phrase searches
    * explode its `positions` column). */
  def writePositionalIndex(docs: DataFrame, spark: SparkSession,
                           table: String, basePath: String,
                           nBuckets: Int = 16, idCol: String = "doc_id",
                           textCol: String = "text"): Unit =
    writeTextIndex(docs, spark, table, basePath, nBuckets, idCol, textCol)

  /** Alias of [[appendToTextIndex]] (see [[writePositionalIndex]]). */
  def appendToPositionalIndex(batch: DataFrame, spark: SparkSession,
                              table: String, idCol: String = "doc_id",
                              textCol: String = "text",
                              batchTag: Option[String] = None): Unit =
    appendToTextIndex(batch, spark, table, idCol, textCol, batchTag)

  /** Exact phrase search: docs containing `phrase` as CONSECUTIVE
    * tokens, with the match count. The scan is bucket-pruned to the
    * phrase's terms and visibility-filtered like every search here;
    * the positional AND is pure arithmetic — occurrence i of the
    * phrase's i-th term is mapped to its candidate START (`pos − i`),
    * and a start where all k distinct offsets appear is a match. So
    * the only data-sized work is the pruned scan + one groupBy on
    * (doc, start): candidate volume is the phrase terms' posting mass,
    * never the corpus, and no self-join over positions ever happens.
    * Repeated terms in the phrase are handled (each offset's rows are
    * tagged with their offset index; a start needs all k DISTINCT
    * offsets). */
  def searchPhrase(spark: SparkSession, table: String,
                   phrase: Seq[String]): DataFrame = {
    val qs = phrase.map(_.toLowerCase).filter(_.nonEmpty)
    require(qs.nonEmpty, "searchPhrase needs at least one token")
    import spark.implicits._
    // occurrence rows come from exploding the pruned unified rows'
    // positions — the scan reads (term, doc_id, positions), never tf
    val posts = livePostings(spark, table, col("term").isin(qs.distinct: _*))
      .select(col("doc_id"), col("term"), explode(col("positions")).as("pos"))
    // one broadcast (term → offset) join = ONE pass over the pruned
    // scan, repeated phrase words fanning out to each of their offsets
    val offsets = qs.zipWithIndex.toDF("term", "__i")
    val starts = posts.join(broadcast(offsets), "term")
      .select(col("doc_id"), (col("pos") - col("__i")).as("start"),
        col("__i"))
    starts.groupBy("doc_id", "start")
      .agg(countDistinct("__i").as("__k"))
      .filter(col("__k") === qs.size && col("start") >= 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Proximity (sloppy-phrase) search: docs where the phrase's terms
    * occur IN ORDER within a span of at most `maxSpan` tokens —
    * `maxSpan = k−1` degenerates to exact consecutiveness
    * ([[searchPhrase]] semantics, spec-pinned equal). `n_matches`
    * counts the distinct anchor positions (occurrences of the first
    * term) that begin at least one valid ordered chain.
    *
    * Exactness without a position self-join: for a FIXED anchor the
    * GREEDY chain (always the smallest next position) minimizes the
    * final position, so "some chain fits in the span" ⟺ "the greedy
    * chain fits" — and the greedy walk is pure array arithmetic over
    * the doc's own occurrences of the phrase terms, evaluated inside
    * one groupBy row per (query, doc). Candidate volume is the phrase
    * terms' posting mass (pruned scan), per-candidate state is that
    * doc's occurrences of those terms — never the corpus, never a
    * pairwise join. */
  def searchPhraseWindow(spark: SparkSession, table: String,
                         phrase: Seq[String], maxSpan: Int): DataFrame = {
    require(phrase.nonEmpty, "searchPhraseWindow needs at least one token")
    import spark.implicits._
    phraseWindowScores(
      Seq((0L, phrase)).toDF("query_id", "terms"), spark, table, maxSpan)
      .select("doc_id", "n_matches")
  }

  /** Batched proximity search: one (query_id, terms array) row per
    * query, scored in ONE pruned pass (the [[searchBm25Batch]] shape),
    * per-query top-k ranks by (n_matches desc, doc_id) — the third
    * retriever of the hybrid stack, fusable by
    * [[RetrievalOps.rrfFuse]]. */
  def searchPhraseWindowBatch(queries: DataFrame, spark: SparkSession,
                              table: String, topK: Int, maxSpan: Int,
                              maxPrunedTerms: Int = 1024): DataFrame = {
    val scored = phraseWindowScores(queries, spark, table, maxSpan,
      maxPrunedTerms)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("n_matches"), col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "doc_id", "rank", "n_matches")
  }

  /** Shared proximity scorer: (query_id, doc_id, n_matches > 0). */
  private def phraseWindowScores(queries: DataFrame, spark: SparkSession,
                                 table: String, maxSpan: Int,
                                 maxPrunedTerms: Int = 1024): DataFrame = {
    // offsets are POSITIONS in the phrase — no empty-token filtering
    // here (it would silently shift the phrase), unlike the bag-of-
    // terms searches
    val qt = queries.select(col("query_id"),
      posexplode(transform(col("terms"), t => lower(t))))
      .select(col("query_id"), col("pos").as("__i"), col("col").as("term"))
      // consumed by the term probe AND the join; LAZY — the probe's
      // bounded collect materializes it in the same job
      .localCheckpoint(false)
    val qk = queries.select(col("query_id"),
      size(col("terms")).as("__k"))
    val posts = livePostingsForTerms(spark, table, qt.select("term"),
      maxPrunedTerms)
      .select(col("doc_id"), col("term"), explode(col("positions")).as("pos"))
    // one row per (query, doc): that doc's occurrences of the query's
    // terms, tagged with their phrase offsets — bounded by the doc's
    // own token count, the same bound as the spec's brute force
    val occ = posts.join(qt, "term")
      .repartition(col("query_id"), col("doc_id")) // see searchBm25Batch
      .groupBy("query_id", "doc_id")
      .agg(collect_list(struct(col("__i"), col("pos"))).as("__occ"))
      .join(broadcast(qk), "query_id")
    // greedy chain from each anchor, as ONE codegen'd primitive pass
    // per (query, doc) candidate (graft.expressions.GreedyChainCount —
    // the five nested HOF lambdas this replaces ran interpreted with
    // boxed longs on every candidate; differential parity is pinned in
    // GreedyChainSpec). The expression also subsumes the old
    // missing-offset pre-filter: a doc lacking any phrase offset counts
    // zero anchors by construction.
    val bridge = org.apache.spark.sql.GraftColumnBridge
    val out = occ
      .withColumn("n_matches", bridge.column(
        graft.expressions.GreedyChainCount(
          bridge.expression(col("__occ")), bridge.expression(col("__k")),
          maxSpan)))
      .filter(col("n_matches") > 0)
      .select("query_id", "doc_id", "n_matches")
      .localCheckpoint(true) // bounded: matching (query, doc) pairs
    qt.unpersist()
    out
  }

  /** Pruned live-postings scan for a term-set frame: collected and
    * pushed as an `IN` when the universe is small (bucket-pruned, the
    * single-query path's plan), a semi-join against the scan when it
    * isn't — the full read is then amortized over the query batch that
    * produced it, the right trade exactly when pruning stopped being
    * selective anyway. */
  private def livePostingsForTerms(spark: SparkSession, table: String,
                                   terms: DataFrame,
                                   maxPrunedTerms: Int): DataFrame = {
    val universe = terms.distinct()
      .limit(maxPrunedTerms + 1).collect().map(_.getString(0)) // bounded
    if (universe.length <= maxPrunedTerms)
      livePostings(spark, table, col("term").isin(universe.toIndexedSeq: _*))
    else livePostings(spark, table, lit(true))
      .join(terms.distinct(), Seq("term"), "left_semi")
  }

  /** [[ingestStream]]'s positional sibling: exactly-once positional-
    * index maintenance over at-least-once micro-batches — the engine's
    * `batchId` is the ledger's logical tag, so a batch redelivered
    * after a crash between the append and the checkpoint commit lands
    * nothing twice. Caller starts/stops the returned query. */
  def ingestPositionalStream(docs: DataFrame, spark: SparkSession,
                             table: String, checkpointLocation: String,
                             idCol: String = "doc_id",
                             textCol: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          appendToPositionalIndex(batch, spark, table, idCol, textCol,
            batchTag = Some(s"stream-$batchId"))
      }
      .start()

  // ------------------------------------------------- BM25 ranked search

  /** Scored postings: one (doc_id, term, tf, dlen) row per DISTINCT
    * term of each doc (derivation helper for spec oracles — the
    * persisted layout is [[unifiedPostings]], which adds positions). */
  def scoredPostings(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      DedupOps.tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dlen"),
        explode(col("__t")).as("term"))
      .groupBy("doc_id", "term", "dlen")
      .agg(count(lit(1)).as("tf"))

  /** Alias of [[writeTextIndex]] kept for the ranked-retrieval call
    * sites: the unified layout IS the BM25 index (its scans read
    * (term, doc_id, tf, dlen) and column-prune the positions away). */
  def writeScoredIndex(docs: DataFrame, spark: SparkSession, table: String,
                       basePath: String, nBuckets: Int = 16,
                       idCol: String = "doc_id",
                       textCol: String = "text"): Unit =
    writeTextIndex(docs, spark, table, basePath, nBuckets, idCol, textCol)

  /** Alias of [[appendToTextIndex]] (see [[writeScoredIndex]]). */
  def appendToScoredIndex(batch: DataFrame, spark: SparkSession,
                          table: String, idCol: String = "doc_id",
                          textCol: String = "text",
                          batchTag: Option[String] = None): Unit =
    appendToTextIndex(batch, spark, table, idCol, textCol, batchTag)

  /** The per-doc retraction frame of an RTBF request: one (doc_id,
    * dlen) row per ingested-and-not-yet-deleted requested id, read off
    * the id-bucketed `<table>_docs` sidecar — an IN-pushdown when the
    * literal id list is in hand (bucket-pruned: spec-asserted), a
    * semi-join against the sidecar (docs-sized, never postings-sized)
    * otherwise. `max(dlen)` collapses the one-row-per-batch history;
    * the id-immutability contract makes every copy equal anyway. */
  private[ops] def rtbfDocFrame(spark: SparkSession, table: String,
                                want: Either[Seq[Any], DataFrame]): DataFrame = {
    val side = withCommitted(spark.table(docsTable(table)), spark, table,
      asOfSeq = None)
    (want match {
      case Left(idLits) => side.filter(col("doc_id").isin(idLits: _*))
      case Right(idsDf) => side.join(idsDf, Seq("doc_id"), "left_semi")
    }).groupBy("doc_id").agg(max("dlen").as("dlen"))
  }

  /** Right-to-be-forgotten: tombstone `ids` so every search excludes
    * them — from results, from df (the pruned scan is tombstone-filtered
    * BEFORE the df groupBy) and from the corpus stats (one negative
    * ledger row retracts exactly the deleted docs' n_docs/sum_dlen
    * mass, read off the doc sidecar). All three index kinds retract
    * exactly — the sidecar carries each doc's true token count whether
    * or not the postings denormalize it.
    *
    * Idempotent without a tag: already-tombstoned ids are filtered out
    * up front, so a re-submitted delete recomputes an empty correction
    * and writes nothing; a TORN delete (tombstones landed, ledger row
    * didn't) left its tombstones uncommitted-invisible, so the retry
    * re-runs cleanly. Ids never ingested are ignored — there is nothing
    * of theirs to forget in this store; zero-token docs ARE retracted
    * (they counted toward N at ingest).
    *
    * Cost: an RTBF batch is REQUEST-sized — up to `maxPrunedIds` ids it
    * collects them and reads only the sidecar buckets they hash into;
    * past the cap it degrades to one sidecar scan (docs-sized), never a
    * postings scan. */
  def deleteFromTextIndex(ids: DataFrame, spark: SparkSession,
                          table: String, idCol: String = "doc_id",
                          maxPrunedIds: Int = 65536): Unit = {
    requireSidecar(spark, table, "deleteFromTextIndex")
    val want = minusTombstones(
      ids.select(col(idCol).as("doc_id")).distinct(), spark, table)
    val sample = want.limit(maxPrunedIds + 1).collect().map(_.get(0))
    if (sample.isEmpty) return
    // the retraction frame is REQUEST-sized by construction, so on the
    // pruned path it is collected outright: the one bounded job yields
    // the tombstone rows AND the (k, Σdlen) retraction in one pass —
    // no eager checkpoint, no second aggregate job. Only the
    // degraded (> maxPrunedIds) path keeps the frame distributed.
    val tag = physicalTag(Some("delete"))
    var pinned: Option[DataFrame] = None // degraded path's checkpoint
    val (tomb, k, s) =
      if (sample.length <= maxPrunedIds) {
        val frame = rtbfDocFrame(spark, table, Left(sample.toIndexedSeq))
        val rows = frame.collect() // bounded: ≤ maxPrunedIds (doc_id, dlen) rows
        // rebuild the tombstone frame with the sidecar's NATIVE doc_id
        // type (the degraded path writes it verbatim): a hardcoded long
        // would throw on a non-long id column and diverge the tombstone
        // schema between the two paths
        val tombSchema = org.apache.spark.sql.types.StructType(
          Seq(frame.schema("doc_id")))
        (spark.createDataFrame(
          java.util.Arrays.asList(rows.map(r =>
            org.apache.spark.sql.Row(r.get(0))): _*), tombSchema)
          .withColumn("__batch", lit(tag)),
          rows.length.toLong, rows.map(_.getLong(1)).sum)
      } else {
        val perDoc = rtbfDocFrame(spark, table, Right(want))
          .localCheckpoint(false) // the aggregate below materializes it
        pinned = Some(perDoc)
        val agg = perDoc.agg(count(lit(1)).as("k"),
          coalesce(sum("dlen"), lit(0L)).as("s")).head()
        (perDoc.select(col("doc_id"), lit(tag).as("__batch")),
          agg.getLong(0), agg.getLong(1))
      }
    if (k > 0) {
      // the first delete CREATES the table, as an EXTERNAL table
      // beside the index (derived from the postings table's location —
      // a managed table would collide with stale warehouse dirs left
      // by earlier JVMs' same-named indexes): the lazy-tombstone
      // contract minusTombstones keys on
      val w = tomb.coalesce(1).write.mode("append")
      // the tombstone write and the ledger-slot probe are independent
      // (the ledger row — the commit point — still lands strictly after
      // both): overlap them
      var seq = 0L
      graft.util.Par.run(
        () => {
          if (spark.catalog.tableExists(tombTable(table)))
            w.saveAsTable(tombTable(table))
          else {
            val postingsLoc = new org.apache.hadoop.fs.Path(
              spark.sessionState.catalog.getTableMetadata(
                org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
            val tombPath = new org.apache.hadoop.fs.Path(
              postingsLoc.getParent, "tombstones").toString
            w.option("path", tombPath).saveAsTable(tombTable(table))
          }
        },
        () => seq = ledgerProbe(spark, table, None)._2)
      commitLedger(spark, table, tag, None, -k, -s,
        seq = seq, overwrite = false)
    }
    pinned.foreach(_.unpersist())
  }

  /** BM25 top-k: the disjunctive ranked-retrieval twin of
    * [[searchAllTerms]]. The postings scan is bucket-pruned to the
    * query terms and visibility-filtered (committed batches only, minus
    * tombstones — both broadcast ledger-sized joins); document
    * frequency comes off that same pruned scan (df(t) = live posting
    * count of t — exact, no stored df to maintain); corpus stats are a
    * broadcast one-row aggregate of the ledger. So the only data-sized
    * work is one pruned scan + one groupBy on the surviving postings —
    * candidate volume is the query terms' posting mass, never the
    * corpus.
    *
    * Scoring is Robertson/Lucene BM25:
    * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`, contribution
    * `idf · tf·(k1+1) / (tf + k1·(1 − b + b·dlen/avgdl))`. Contributions
    * round to 6 decimals and the summed score to 4 — wide enough to
    * absorb last-ulp libm `ln` divergence across engines, tight enough
    * that the driver's hash compare pins every df/tf/dlen/avgdl input
    * exactly ([[graft.queries.TextOps]] `text_bm25`).
    *
    * TIME TRAVEL: `asOfSeq = Some(n)` answers from the index exactly
    * as of ledger commit `n` (capture one with [[currentLedgerSeq]]):
    * postings, tombstones, df and corpus stats all flow through the
    * SAME ledger-prefix visibility filter, so later appends vanish and
    * later deletes un-happen — rollback/audit of a bad ingest with no
    * store mutation, the [[IncrementalAggOps.readAggStoreAt]] symmetry
    * for ranked search. The floor is the newest REBUILD (this index's
    * vacuum): physically reclaimed history fails loudly
    * ([[requireAsOfReadable]]), never approximately. */
  def searchBm25(spark: SparkSession, table: String, terms: Seq[String],
                 topK: Int, k1: Double = 1.2, b: Double = 0.75,
                 asOfSeq: Option[Long] = None): DataFrame = {
    require(terms.nonEmpty, "searchBm25 needs at least one term")
    requireAsOfReadable(spark, table, asOfSeq)
    val qs = terms.map(_.toLowerCase).distinct.filter(_.nonEmpty)
    val posts = livePostings(spark, table, col("term").isin(qs: _*), asOfSeq)
    val dfreq = posts.groupBy("term").agg(count(lit(1)).as("df"))
    val st = ledgerTotals(spark, table, asOfSeq)
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

  /** Physical reclaim for either index kind — the compaction the
    * delete and torn-batch paths defer to: rewrite the postings keeping
    * ONLY live rows (committed batches, minus tombstoned docs), one
    * file per bucket again after N appends. Rows reclaimed: tombstoned
    * docs' postings (physically gone at last) and torn attempts'
    * uncommitted rows.
    *
    * The load-bearing design point: live rows keep their ORIGINAL
    * `__batch` tags and the ledger/tombstone side tables are NOT
    * touched — visibility is ledger-driven, so a pure physical rewrite
    * needs no new commit point, the replay guard survives by
    * construction (a late redelivery of any old batch tag — including
    * one carrying a deleted doc — is still a no-op), the corpus stats
    * (already net of the deletes' negative rows) stay exact, and
    * re-deletes stay idempotent. Contrast
    * [[DedupOps.rebuildFingerprintStore]], whose guard rides data rows
    * and must carry tombstones forward explicitly.
    *
    * Writes land at the NEW `basePath`; old postings files are never
    * deleted, so a crash mid-rewrite loses nothing — re-register the
    * table at the old path and re-run. Quiet-window maintenance, like
    * every sibling store's rebuild. */
  def rebuildTextIndex(spark: SparkSession, table: String,
                       basePath: String, nBuckets: Int = 16): Unit = {
    requireSidecar(spark, table, "rebuildTextIndex")
    val live = minusTombstones(
      withCommitted(spark.table(table), spark, table, asOfSeq = None),
      spark, table)
    // the doc sidecar compacts under the same rule (live rows, ORIGINAL
    // tags): deleted docs' rows go, the ledger already carries their
    // negative correction, and a replayed delete of them stays a no-op
    // via the untouched tombstone table. The two rewrites read and
    // write disjoint tables — independent jobs, submitted concurrently.
    val liveDocs = minusTombstones(
      withCommitted(spark.table(docsTable(table)), spark, table,
        asOfSeq = None),
      spark, table)
    graft.util.Par.run(
      () => LayoutOps.writeBucketed(live, spark, table, s"$basePath/postings",
        nBuckets, "term"),
      () => LayoutOps.writeBucketed(liveDocs, spark, docsTable(table),
        s"$basePath/docs", nBuckets, "doc_id"))
    // the `<table>_terms` statistics sidecar is deliberately NOT
    // compacted: its rows are per-(term, batch) UPPER-BOUND inputs
    // (df sum, max tf, min dlen), and physically removing postings can
    // only move the live values further UNDER the stored bounds —
    // still-correct pruning, just looser for heavily-deleted terms
    // until their next append. Recomputing the stats from live rows
    // here would instead UNDER-state df (the ledger's delete rows
    // subtract the tombstoned mass a second time) — looser still, and
    // a rewrite of a table this path doesn't otherwise touch.
    //
    // one sums-neutral BARRIER row marks the history collapse: the
    // rebuild physically reclaimed tombstoned/torn rows, so as-of reads
    // older than this seq become unanswerable and must fail loudly
    // (the vacuum-retention-floor analog of readAggStoreAt). Corpus
    // stats, visibility and the replay guard are untouched — the row
    // carries (0, 0) mass and a tag no posting wears.
    commitLedger(spark, table, physicalTag(Some(RebuildBarrier)),
      Some(RebuildBarrier), 0L, 0L,
      seq = ledgerProbe(spark, table, None)._2, overwrite = false)
  }

  /** Lift [[appendToScoredIndex]] into a Structured Streaming sink —
    * exactly-once index maintenance over at-least-once micro-batch
    * delivery: the engine's `batchId` IS the logical batch tag, so a
    * batch redelivered after a crash between the append and the
    * checkpoint commit finds its tag in the ledger and lands nothing
    * twice (the [[VectorStoreOps.ingestStream]] shape, on the text
    * tier). Caller starts/stops the returned query. */
  def ingestStream(docs: DataFrame, spark: SparkSession, table: String,
                   checkpointLocation: String,
                   idCol: String = "doc_id", textCol: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idle triggers append nothing — skip the ledger round trip
        if (!batch.isEmpty)
          appendToScoredIndex(batch, spark, table, idCol, textCol,
            batchTag = Some(s"stream-$batchId"))
      }
      .start()

  /** The shared ledger-totals frame BM25 scoring broadcasts; `asOfSeq`
    * sums only the ledger prefix (exact corpus stats at that commit). */
  private def ledgerTotals(spark: SparkSession, table: String,
                           asOfSeq: Option[Long] = None): DataFrame = {
    val led = spark.table(s"${table}_stats")
    asOfSeq.fold(led)(n => led.filter(col("seq") <= n))
      .agg(sum("n_docs").as("n"), sum("sum_dlen").as("sd"))
  }

  /** Score posting rows to (term, doc_id, __c): a (term, doc)
    * contribution is QUERY-INDEPENDENT, so it is computed ONCE per
    * posting BEFORE any fan-out to the queries that share a term — the
    * idf/length-norm arithmetic runs once per posting, and the
    * (posting × query) fan-out — a batch's only super-linear term —
    * carries just a precomputed value to sum (measured 2.7M fan-out
    * rows over 116k postings on the hybrid gate: 23x less scoring
    * arithmetic; __c never depended on query_id). `dfreq` is passed in
    * (not derived from `posts`) because the probe tier scores a
    * candidate-shrunk scan against the FULL live df. */
  private def bm25Contrib(posts: DataFrame, dfreq: DataFrame, st: DataFrame,
                          k1: Double, b: Double): DataFrame =
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
      .select("term", "doc_id", "__c")

  /** Per-query top-k over a (query_id, doc_id, score, matched) frame:
    * rank ≤ k → WindowGroupLimit caps every group pre-shuffle. */
  private def bm25Rank(scored: DataFrame, topK: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("score"), col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "doc_id", "rank", "score", "matched")
  }

  /** The exact full-evaluation batch plan (every query term's postings
    * scored and fanned out): the baseline the pruned tier falls back to,
    * and the whole plan when pruning has nothing to prune. Clusters the
    * fan-out on the GROUP keys before aggregating: the fan-out arrives
    * partitioned by term bucket, where a (query, doc) pair's
    * contributions are spread across its terms' buckets — the
    * partial-agg maps inflate to ~group-cardinality per partition and
    * reduce almost nothing (measured 4x cpu on the hybrid gate). One
    * explicit hash exchange on (query_id, doc_id) gives the aggregate
    * perfect map locality, is exactly the shuffle the planner would
    * have inserted AFTER the useless partial pass, and stays skew-free
    * (doc_id in the key spreads any one query's result set). AQE still
    * coalesces it (no fixed partition count). */
  private def bm25BatchFull(qt: DataFrame, posts: DataFrame,
                            spark: SparkSession, table: String, topK: Int,
                            k1: Double, b: Double,
                            asOfSeq: Option[Long] = None): DataFrame = {
    val dfreq = posts.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = bm25Contrib(posts, dfreq,
      ledgerTotals(spark, table, asOfSeq), k1, b)
    bm25Rank(contrib.join(qt, "term")
      .repartition(col("query_id"), col("doc_id"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("__c"), 4).as("score"),
        count(lit(1)).as("matched")), topK)
  }

  /** Batched BM25: score a whole DataFrame of queries `(query_id,
    * terms array<string>)` against the index in ONE pass — the shape
    * retrieval evaluation and hard-negative mining actually run
    * (thousands of queries), where per-query [[searchBm25]] calls would
    * pay the scan and stats setup per query.
    *
    * Scoring is identical to [[searchBm25]] (df off the live scan,
    * ledger stats, round-6/round-4), just keyed by `query_id`; top-k is
    * a per-query window (rank ≤ k → WindowGroupLimit caps every
    * group pre-shuffle).
    *
    * Scan strategy: when the batch's distinct-term universe is small
    * (≤ `maxPrunedTerms`, the common case — query vocabularies are
    * tiny relative to corpora) it is collected and pushed as an
    * `IN`-filter, keeping the bucket-pruned scan of the single-query
    * path. A bigger universe flips to joining the scan against the
    * term set — the full postings read is then amortized over the
    * thousands of queries that produced it, which is the right trade
    * exactly when pruning stopped being selective anyway (and the
    * pruning below is skipped for the same reason).
    *
    * == Score-upper-bound pruning (MaxScore/WAND-style, exact) ==
    *
    * A stopword in a query used to make that query's candidate set
    * corpus-sized: the term's FULL postings entered the scoring
    * fan-out, though BM25's own idf drives its contributions toward
    * zero. The pruned tier restores top-k exactness at stopword-free
    * cost:
    *
    *  1. A bounded probe reads the `<table>_terms` sidecar for the
    *     batch's term universe and computes each term's score UPPER
    *     BOUND: `ub(t) = idf_ub(t) · kernel_ub(t)` with
    *     `idf_ub` from `df_lb = max(0, Σ committed df − D)` (D = docs
    *     ever deleted, off the ledger's negative rows — live df can
    *     only sit between df_lb and the committed sum, and idf is
    *     decreasing in df) and `kernel_ub` from the committed
    *     (max tf, min dlen) extremes (the tf-kernel is increasing in
    *     tf, decreasing in dlen). Every input moves in the SAFE
    *     direction under deletes and rebuilds, so ub is valid against
    *     any live posting, merely loose after heavy deletion.
    *  2. Terms with committed df > `stopDfFrac` of all ever-ingested
    *     docs classify as STOPWORDS; the rest are ESSENTIAL. Queries
    *     with no essential term route to the full plan up front (their
    *     exact top-k genuinely needs every posting).
    *  3. Phase 1 scores ONLY essential postings → the candidate set
    *     (every doc matching ≥ 1 essential term of the query).
    *  4. Phase 2 PROBES stopword postings for candidate docs only:
    *     the scan is semi-joined to the candidate doc set BEFORE the
    *     query fan-out, so the super-linear fan-out never sees a
    *     corpus-sized posting list (df for scoring still comes exact
    *     off the unshrunk scan). Candidates' final scores are exact.
    *  5. ACCEPTANCE, per query: a doc matching only stopwords scores
    *     ≤ S_P(q) = Σ ub over the query's stopwords; the pruned result
    *     stands iff the k-th candidate score strictly clears S_P(q)
    *     (+1e-3 slack absorbing the round-6/round-4 convention).
    *     Queries that fail re-run through the full plan — pruning can
    *     REFUSE and fall back, never silently differ (spec-pinned
    *     pruned ≡ unpruned on stopword/tie adversaries).
    *
    * `stopDfFrac` ≥ 1 disables classification (every term essential —
    * the exact r14 plan); the default 0.5 is the classic stopword
    * threshold. Pruning also steps aside when the terms sidecar is
    * missing (pre-r15 index), the universe overflows `maxPrunedTerms`,
    * (k1, b) leave the Robertson kernel's monotone regime, under a 10%
    * mixed-query share (all-stop queries cost the same either way), or
    * under `asOfSeq` — time travel runs the full plan with the
    * [[searchBm25]] ledger-prefix visibility (the bound sidecar
    * describes the CURRENT index; prefix-filtered bounds would buy
    * little on an audit/rollback path). */
  def searchBm25Batch(queries: DataFrame, spark: SparkSession,
                      table: String, topK: Int,
                      k1: Double = 1.2, b: Double = 0.75,
                      maxPrunedTerms: Int = 1024,
                      stopDfFrac: Double = 0.5,
                      asOfSeq: Option[Long] = None): DataFrame =
    searchBm25BatchDiag(queries, spark, table, topK, k1, b,
      maxPrunedTerms, stopDfFrac, asOfSeq)._1

  /** [[searchBm25Batch]] plus the route the planner took — a test
    * seam ("full-scan", "full-in", "pruned", "pruned+fallback",
    * "pruned+allstop", ...): specs assert the pruning engaged (or
    * refused) where designed, without reaching into the plan. */
  private[graft] def searchBm25BatchDiag(queries: DataFrame,
                                       spark: SparkSession,
                                       table: String, topK: Int,
                                       k1: Double = 1.2, b: Double = 0.75,
                                       maxPrunedTerms: Int = 1024,
                                       stopDfFrac: Double = 0.5,
                                       asOfSeq: Option[Long] = None)
      : (DataFrame, String) = {
    import spark.implicits._
    requireAsOfReadable(spark, table, asOfSeq)
    // lowercase BEFORE the distinct ("Batch" and "batch" are one query
    // term, not a doubled contribution), matching searchBm25's
    // normalize-then-dedup order
    val qt = queries.select(col("query_id"),
      explode(array_distinct(transform(col("terms"), t => lower(t))))
        .as("term"))
      .filter(length(col("term")) > 0)
      // consumed by the term probe AND the scoring join; LAZY — the
      // universe collect right below materializes the blocks in the
      // same job instead of paying a separate one
      .localCheckpoint(false)
    val universe = qt.select("term").distinct()
      .limit(maxPrunedTerms + 1).collect().map(_.getString(0)) // bounded
    // materialize the (queries × k)-bounded result eagerly so qt's
    // checkpoint blocks (and the pruned tier's intermediates) can be
    // RELEASED here rather than leaking one pinned RDD per call until
    // the context cleaner happens to run
    def finish(ranked: DataFrame, route: String): (DataFrame, String) = {
      val out = ranked.localCheckpoint(true)
      qt.unpersist()
      (out, route)
    }
    if (universe.length > maxPrunedTerms)
      return finish(bm25BatchFull(qt,
        livePostings(spark, table, lit(true), asOfSeq)
          .join(qt.select("term").distinct(), Seq("term"), "left_semi"),
        spark, table, topK, k1, b, asOfSeq), "full-scan")
    val inAll = col("term").isin(universe.toIndexedSeq: _*)
    def fullIn(route: String) = finish(
      bm25BatchFull(qt, livePostings(spark, table, inAll, asOfSeq),
        spark, table, topK, k1, b, asOfSeq), route)
    // an as-of batch always runs the full plan: the bound sidecar's
    // statistics describe the CURRENT index (they only ever loosen over
    // time), so pruning a historical read would need prefix-filtered
    // bounds for marginal gain on an audit/rollback path
    if (asOfSeq.isDefined || universe.isEmpty || stopDfFrac >= 1.0 ||
        b < 0 || b > 1 ||
        k1 <= 0 || !spark.catalog.tableExists(termsTable(table)))
      return fullIn("full-in")
    // ONE bounded probe job: committed bound statistics for the term
    // universe (bucket-pruned sidecar read) beside the ledger totals
    val probeRows = withCommitted(
      spark.table(termsTable(table)).filter(inAll), spark, table,
      asOfSeq = None)
      .groupBy("term")
      .agg(sum("df").as("__sdf"), max("max_tf").as("__mtf"),
        min("min_dlen").as("__mdl"))
      .crossJoin(spark.table(s"${table}_stats").agg(
        coalesce(sum("n_docs"), lit(0L)).as("__n"),
        coalesce(sum("sum_dlen"), lit(0L)).as("__sd"),
        coalesce(sum(when(col("n_docs") < 0, -col("n_docs"))
          .otherwise(0L)), lit(0L)).as("__d")))
      .collect() // bounded: ≤ universe rows
    if (probeRows.isEmpty) return fullIn("full-in") // nothing committed
    val n = probeRows.head.getLong(4)
    val sd = probeRows.head.getLong(5)
    val d = probeRows.head.getLong(6)
    if (n <= 0) return fullIn("full-in") // deleted-to-empty index
    val avgdl = sd.toDouble / n.toDouble
    // stopword classification + per-term upper bounds, driver-side
    // (the probe is universe-bounded; no data-sized state here)
    val prunedUb = probeRows.flatMap { r =>
      val sdf = r.getLong(1)
      if (sdf <= stopDfFrac * (n + d)) None
      else {
        val dfLb = math.max(0L, sdf - d).toDouble
        val idfUb = math.log(1.0 + (n - dfLb + 0.5) / (dfLb + 0.5))
        val mtf = r.getLong(2).toDouble
        val mdl = r.getLong(3).toDouble
        val kUb = mtf * (k1 + 1) / (mtf + k1 * (1 - b + b * mdl / avgdl))
        Some((r.getString(0), idfUb * kUb))
      }
    }.toIndexedSeq
    val prunedSet = prunedUb.map(_._1).toSet
    val present = probeRows.map(_.getString(0)).toSet
    val essTerms = universe.toIndexedSeq.filterNot(prunedSet)
    if (prunedUb.isEmpty) return fullIn("full-in")     // no stopwords
    if (!essTerms.exists(present)) return fullIn("full-in") // no candidates possible
    val essIn = col("term").isin(essTerms: _*)
    val prunedIn = col("term").isin(prunedSet.toIndexedSeq: _*)
    // route all-stopword queries to the full plan UP FRONT (not via
    // the fallback): their exact top-k needs every posting, so running
    // them through the candidate machinery first would be pure waste
    val qClass = qt.groupBy("query_id")
      .agg(max(when(essIn, 1).otherwise(0)).as("__he"))
      // one row per query; LAZY — the mixed-share aggregate right below
      // materializes it in its own job
      .localCheckpoint(false)
    // cost model: all-stop queries cost the same through either plan
    // (their exact top-k needs every posting), so the pruned tier only
    // earns its ~half-dozen extra driver jobs when a real share of the
    // batch is mixed. Below a 10% mixed share, route the WHOLE batch
    // to the full plan — the savings on a handful of queries can't
    // cover the orchestration (measured ~1 s of fixed jobs at gate
    // scale; at corpus scale the mixed share, not the corpus, is still
    // the right dial).
    val mixShare = qClass.agg(
      coalesce(sum("__he"), lit(0L)).cast("double") /
        greatest(count(lit(1)), lit(1L))).head().getDouble(0)
    if (mixShare < 0.1) {
      qClass.unpersist()
      return fullIn("full-in")
    }
    val qAllP = qClass.filter(col("__he") === 0).select("query_id")
    val hasAllStop = !qAllP.isEmpty
    val st = ledgerTotals(spark, table)
    // CANDIDATE DOCS are query-independent: any doc matching ANY
    // essential posting (a doc matching an essential term of query q is
    // a candidate of q by definition, and of every other query it
    // shares a stopword with — whose contribution we then need anyway).
    // So the stopword scan shrinks with ONE doc-level semi-join, both
    // contribution streams share ONE aggregation, and every emitted
    // (query, doc) pair carries its EXACT full score: essential
    // contributions are never shrunk, and a candidate doc's stopword
    // postings all survive the semi-join. The pairs the shrink omits
    // are exactly docs matching ONLY stopwords of their query — the
    // set the acceptance bound below covers.
    val postsE = livePostings(spark, table, essIn)
    val contribE = bm25Contrib(postsE,
      postsE.groupBy("term").agg(count(lit(1)).as("df")), st, k1, b)
    // df for scoring comes off the UNSHRUNK live scan (exact); the
    // candidate semi-join lands BEFORE the query fan-out, so the
    // super-linear stage never sees a corpus-sized posting list
    val postsP = livePostings(spark, table, prunedIn)
    val dfreqP = postsP.groupBy("term").agg(count(lit(1)).as("df"))
    val contribP = bm25Contrib(
      postsP.join(postsE.select("doc_id").distinct(),
        Seq("doc_id"), "left_semi"), dfreqP, st, k1, b)
    val qtPm = qt.filter(prunedIn)
      .join(qAllP, Seq("query_id"), "left_anti")
    val scored = contribE.join(qt.filter(essIn), "term")
      .unionByName(contribP.join(qtPm, "term"))
      .repartition(col("query_id"), col("doc_id")) // see bm25BatchFull
      .groupBy("query_id", "doc_id")
      .agg(round(sum("__c"), 4).as("score"), count(lit(1)).as("matched"))
    val ranked = bm25Rank(scored, topK).localCheckpoint(true) // (queries × k)
    // acceptance: an omitted only-stopword doc scores ≤ S_P(q); the
    // pruned top-k stands iff the k-th candidate strictly clears that
    // bound (1e-3 slack > any round-6-per-term + round-4-final
    // inflation)
    val ubDf = prunedUb.toDF("term", "__ub")
    val spQ = qtPm.join(broadcast(ubDf), "term")
      .groupBy("query_id").agg(sum("__ub").as("__sp"))
    val perQ = ranked.groupBy("query_id")
      .agg(min("score").as("__kth"), count(lit(1)).as("__got"))
    val rejected = spQ.join(perQ, Seq("query_id"), "left")
      .filter(col("__got").isNull || col("__got") < topK ||
        col("__kth") <= col("__sp") + lit(1e-3))
      .select("query_id")
      .localCheckpoint(true) // one row per refused query
    val hasRejected = !rejected.isEmpty
    var out = ranked
    var route = "pruned"
    if (hasRejected) {
      // the refusal path: re-run JUST those queries through the exact
      // full plan — pruning degrades to the baseline, never to a
      // different answer
      out = out.join(rejected, Seq("query_id"), "left_anti")
        .unionByName(bm25BatchFull(
          qt.join(rejected, Seq("query_id"), "left_semi"),
          livePostings(spark, table, inAll), spark, table, topK, k1, b))
      route += "+fallback"
    }
    if (hasAllStop) {
      out = out.unionByName(bm25BatchFull(
        qt.join(qAllP, Seq("query_id"), "left_semi"),
        livePostings(spark, table, prunedIn), spark, table, topK, k1, b))
      route += "+allstop"
    }
    val fin = finish(out, route)
    qClass.unpersist()
    ranked.unpersist(); rejected.unpersist()
    fin
  }

  /** Conjunctive (AND-of-terms) search: doc_ids containing EVERY term.
    * The scan is bucket-pruned to the query terms' buckets and
    * visibility-filtered like [[searchBm25]]; the AND is a
    * distinct-term count per doc over the surviving postings. */
  def searchAllTerms(spark: SparkSession, table: String,
                     terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAllTerms needs at least one term")
    // normalize like the postings themselves (DedupOps.tokens
    // lowercases) and dedup: a verbatim "Batch" would match nothing,
    // and a duplicated term would demand more distinct matches than
    // can exist — both silently empty, not errors
    val qs = terms.map(_.toLowerCase).distinct
    livePostings(spark, table, col("term").isin(qs: _*))
      .groupBy("doc_id")
      .agg(countDistinct("term").as("__k"))
      .filter(col("__k") === qs.size)
      .select("doc_id")
  }
}
