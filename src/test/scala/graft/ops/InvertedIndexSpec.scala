package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[InvertedIndexOps]] — the gate (text_search) hash-compares search
  * results through a real build+append against brute-force containment;
  * this spec pins the pruning claim (a k-term query reads only those
  * terms' buckets) and append visibility. */
class InvertedIndexSpec extends SparkTestBase {

  private lazy val docs = graft.queries.t(spark, sfTiny, "documents")

  test("search equals brute-force containment; appended docs are found") {
    val base = Files.createTempDirectory("tidx").toString
    val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    InvertedIndexOps.writeTextIndex(store, spark, "tidx_spec", base)
    val terms = Seq("batch", "scan")
    def brute(d: org.apache.spark.sql.DataFrame) = d
      .filter(terms.map(t =>
        array_contains(DedupOps.tokens(col("text")), t)).reduce(_ && _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val beforeAppend = InvertedIndexOps
      .searchAllTerms(spark, "tidx_spec", terms)
      .collect().map(_.getLong(0)).toSet
    assert(beforeAppend == brute(store))
    InvertedIndexOps.appendToTextIndex(delta, spark, "tidx_spec")
    val afterAppend = InvertedIndexOps
      .searchAllTerms(spark, "tidx_spec", terms)
      .collect().map(_.getLong(0)).toSet
    assert(afterAppend == brute(docs),
      "append must make new docs searchable without a rebuild")
    assert((afterAppend -- beforeAppend).nonEmpty,
      "fixture must add matching docs in the delta")
  }

  test("bm25 search: pruned scan, append-exact stats, naive-score parity") {
    val base = Files.createTempDirectory("tidx-bm25").toString
    val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    InvertedIndexOps.writeScoredIndex(store, spark, "tidx_bm25", base,
      nBuckets = 16)
    InvertedIndexOps.appendToScoredIndex(delta, spark, "tidx_bm25")

    // stats rows sum to the WHOLE corpus exactly (2 commit rows)
    val st = spark.table("tidx_bm25_stats")
      .agg(sum("n_docs"), sum("sum_dlen")).head()
    val expN = docs.count()
    val expSd = docs.agg(
      sum(size(DedupOps.tokens(col("text"))).cast("long"))).head().getLong(0)
    assert(st.getLong(0) == expN && st.getLong(1) == expSd)

    // the ranked result equals a from-scratch naive BM25 over the corpus
    val terms = Seq("batch", "scan", "hash")
    val got = InvertedIndexOps.searchBm25(spark, "tidx_bm25", terms, topK = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val naivePosts = InvertedIndexOps.scoredPostings(docs)
      .filter(col("term").isin(terms: _*))
    val ndf = naivePosts.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = expSd.toDouble / expN.toDouble
    val want = naivePosts.join(ndf, "term")
      .withColumn("__c", round(
        log(lit(1.0) + (lit(expN) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
          ((col("tf") * lit(1.2 + 1)) / (col("tf") + lit(1.2) *
            (lit(0.25) + (lit(0.75) * col("dlen")) / lit(avgdl)))), 6))
      .groupBy("doc_id")
      .agg(round(sum("__c"), 4).as("score"), count(lit(1)).as("matched"))
      .orderBy(desc("score"), col("doc_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)

    // and the scoring scan is bucket-pruned like the conjunctive path
    val df2 = InvertedIndexOps.searchBm25(spark, "tidx_bm25", terms, topK = 5)
    df2.collect()
    val plan = df2.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined && m.get.group(1).toInt <= 3,
      s"bm25 scan must be bucket-pruned:\n$plan")
  }

  test("redelivered batch is a no-op: postings, ledger and scores unchanged") {
    val base = Files.createTempDirectory("tidx-replay").toString
    val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    InvertedIndexOps.writeScoredIndex(store, spark, "tidx_rp", base)
    InvertedIndexOps.appendToScoredIndex(delta, spark, "tidx_rp",
      batchTag = Some("b1"))
    val terms = Seq("batch", "scan", "hash")
    def snap() = (
      spark.table("tidx_rp").count(),
      spark.table("tidx_rp_stats")
        .agg(sum("n_docs"), sum("sum_dlen"), count(lit(1))).head().toSeq,
      InvertedIndexOps.searchBm25(spark, "tidx_rp", terms, topK = 20)
        .collect().toSeq)
    val before = snap()
    // the at-least-once redelivery: same batch, same tag, submitted again
    InvertedIndexOps.appendToScoredIndex(delta, spark, "tidx_rp",
      batchTag = Some("b1"))
    assert(snap() == before,
      "a redelivered committed batch must change nothing")
    // … and the same guard on the plain index
    val base2 = Files.createTempDirectory("tidx-replay2").toString
    InvertedIndexOps.writeTextIndex(store, spark, "tidx_rp2", base2)
    InvertedIndexOps.appendToTextIndex(delta, spark, "tidx_rp2",
      batchTag = Some("b1"))
    val n1 = spark.table("tidx_rp2").count()
    InvertedIndexOps.appendToTextIndex(delta, spark, "tidx_rp2",
      batchTag = Some("b1"))
    assert(spark.table("tidx_rp2").count() == n1)
  }

  test("torn batch (postings landed, ledger row didn't) is invisible; " +
    "its retry lands exactly once") {
    val base = Files.createTempDirectory("tidx-torn").toString
    val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    InvertedIndexOps.writeScoredIndex(store, spark, "tidx_torn", base)
    val terms = Seq("batch", "scan", "hash")
    def res() = InvertedIndexOps
      .searchBm25(spark, "tidx_torn", terms, topK = 20).collect().toSeq
    val before = res()
    // simulate the crash between the two appends: postings rows land
    // under a physical tag that never reaches the ledger
    LayoutOps.appendBucketed(
      InvertedIndexOps.unifiedPostings(delta)
        .withColumn("__batch", lit("b9#torn-attempt")),
      spark, "tidx_torn")
    assert(res() == before,
      "uncommitted postings must be invisible to every search")
    // the orchestrator retries the batch; it commits exactly once
    InvertedIndexOps.appendToScoredIndex(delta, spark, "tidx_torn",
      batchTag = Some("b9"))
    val fullBase = Files.createTempDirectory("tidx-full").toString
    InvertedIndexOps.writeScoredIndex(docs, spark, "tidx_full", fullBase)
    assert(res() == InvertedIndexOps
      .searchBm25(spark, "tidx_full", terms, topK = 20).collect().toSeq,
      "post-retry scores must equal a clean one-shot index (the torn " +
        "rows contribute nothing — no doubled tf/df)")
  }

  test("compliance delete: results, df and corpus stats equal the " +
    "survivor-only index; re-submitted delete is a no-op") {
    val base = Files.createTempDirectory("tidx-del").toString
    InvertedIndexOps.writeScoredIndex(docs, spark, "tidx_del", base)
    val doomed = docs.filter(pmod(col("doc_id"), lit(7)) === 2)
      .select("doc_id")
    InvertedIndexOps.deleteFromTextIndex(doomed, spark, "tidx_del")
    val survivors = docs.filter(pmod(col("doc_id"), lit(7)) =!= 2)
    // ledger sums = survivor corpus exactly (negative row is exact)
    val st = spark.table("tidx_del_stats")
      .agg(sum("n_docs"), sum("sum_dlen")).head()
    assert(st.getLong(0) == survivors.count())
    assert(st.getLong(1) == survivors.agg(
      sum(size(DedupOps.tokens(col("text"))).cast("long"))).head().getLong(0))
    // scores = a from-scratch index over the survivors
    val terms = Seq("batch", "scan", "hash")
    val got = InvertedIndexOps
      .searchBm25(spark, "tidx_del", terms, topK = 20).collect().toSeq
    val cleanBase = Files.createTempDirectory("tidx-del-clean").toString
    InvertedIndexOps.writeScoredIndex(survivors, spark, "tidx_dclean",
      cleanBase)
    assert(got == InvertedIndexOps
      .searchBm25(spark, "tidx_dclean", terms, topK = 20).collect().toSeq)
    // deleted docs are gone from conjunctive search too
    val hits = InvertedIndexOps
      .searchAllTerms(spark, "tidx_del", Seq("batch"))
      .collect().map(_.getLong(0))
    assert(hits.forall(_ % 7 != 2))
    // idempotent: the same RTBF request re-submitted changes nothing
    InvertedIndexOps.deleteFromTextIndex(doomed, spark, "tidx_del")
    val st2 = spark.table("tidx_del_stats")
      .agg(sum("n_docs"), sum("sum_dlen")).head()
    assert(st2.getLong(0) == st.getLong(0) && st2.getLong(1) == st.getLong(1))
    assert(got == InvertedIndexOps
      .searchBm25(spark, "tidx_del", terms, topK = 20).collect().toSeq)
  }

  test("phrase search equals brute-force consecutive-window matching; " +
    "repeated phrase words need genuinely consecutive occurrences") {
    import spark.implicits._
    val base = Files.createTempDirectory("tidx-phrase").toString
    val fixture = Seq(
      (1L, "the data lake holds data lake data lake files"),
      (2L, "data lake"),
      (3L, "lake data"),          // reversed — must not match
      (4L, "data x lake"),        // gapped — must not match
      (5L, "go go go stop"),      // repeated-word phrase territory
      (6L, "go stop go go"),
      (7L, "empty of matches entirely")).toDF("doc_id", "text")
    InvertedIndexOps.writePositionalIndex(fixture, spark, "tidx_ph", base)
    def got(phrase: String*) = InvertedIndexOps
      .searchPhrase(spark, "tidx_ph", phrase)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "data lake": doc 1 has 3 occurrences (positions 2, 5, 7), doc 2 one
    assert(got("data", "lake") == Map(1L -> 3L, 2L -> 1L))
    // repeated-word phrase: "go go" matches only truly consecutive pairs
    assert(got("go", "go") == Map(5L -> 2L, 6L -> 1L))
    assert(got("go", "go", "go") == Map(5L -> 1L))
    // single token degenerates to occurrence counting
    assert(got("lake") == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // and the real corpus agrees with a brute-force window scan
    val base2 = Files.createTempDirectory("tidx-phrase2").toString
    InvertedIndexOps.writePositionalIndex(docs, spark, "tidx_ph2", base2)
    val phrase = Seq("stream", "table", "hash")
    val brute = docs.select(col("doc_id"),
      DedupOps.tokens(col("text")).as("ts"))
      .select(col("doc_id"), posexplode(col("ts")))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("pos"), col("col"))).as("tp")) // bounded: one row per doc (its own tokens)
      .select(col("doc_id"), transform(array_sort(col("tp")),
        x => x.getField("col")).as("ts"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, greatest(size(ts) - 3, -1)), " +
          "i -> struct(ts[i] as a, ts[i+1] as b, ts[i+2] as c))")).as("w"))
      .filter(col("w.a") === phrase.head && col("w.b") === phrase(1) &&
        col("w.c") === phrase(2))
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaIndex = InvertedIndexOps
      .searchPhrase(spark, "tidx_ph2", phrase)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaIndex == brute)
    assert(viaIndex.nonEmpty, "fixture must contain the phrase")
  }

  test("proximity phrase search: ordered chains within the span, exact " +
    "phrase at maxSpan = k-1, brute-force parity on the corpus") {
    import spark.implicits._
    val base = Files.createTempDirectory("tidx-slop").toString
    val fixture = Seq(
      (1L, "data big lake"),            // span 2 chain data->lake
      (2L, "data lake"),                // adjacent
      (3L, "lake data"),                // wrong order — never matches
      (4L, "data x y z lake"),          // span 4
      (5L, "data data lake"),           // two anchors, both chain
      (6L, "lake x data y lake"),       // ordered chain at pos 3
      (7L, "nothing relevant here")).toDF("doc_id", "text")
    InvertedIndexOps.writePositionalIndex(fixture, spark, "tidx_slop", base)
    def got(w: Int, phrase: String*) = InvertedIndexOps
      .searchPhraseWindow(spark, "tidx_slop", phrase, maxSpan = w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // span 1 = adjacency: only docs 2 and 5 (one adjacent pair)
    assert(got(1, "data", "lake") == Map(2L -> 1L, 5L -> 1L))
    // span 2 admits one gap
    assert(got(2, "data", "lake") == Map(1L -> 1L, 2L -> 1L, 5L -> 2L,
      6L -> 1L))
    // span 4 admits doc 4's three-gap chain
    assert(got(4, "data", "lake") == Map(1L -> 1L, 2L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 1L))
    // order is required even at generous spans
    assert(!got(10, "data", "lake").contains(3L))
    // repeated phrase words need strictly increasing DISTINCT positions:
    // "data data" within span 3 matches only doc 5 (one anchor — its
    // second occurrence has no later "data" to chain to)
    assert(got(3, "data", "data") == Map(5L -> 1L))

    // maxSpan = k−1 ≡ exact consecutive phrase, on the real corpus
    val base2 = Files.createTempDirectory("tidx-slop2").toString
    InvertedIndexOps.writePositionalIndex(docs, spark, "tidx_slop2", base2)
    val phrase = Seq("stream", "table", "hash")
    val exact = InvertedIndexOps.searchPhrase(spark, "tidx_slop2", phrase)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val winK1 = InvertedIndexOps
      .searchPhraseWindow(spark, "tidx_slop2", phrase, maxSpan = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(winK1 == exact,
      "maxSpan = k-1 must reproduce exact phrase search")

    // brute-force parity at a real slop: count anchors of term0 from
    // which a greedy in-order walk stays within the span
    val w = 6
    val brute = docs.select(col("doc_id"),
      DedupOps.tokens(col("text")).as("ts")).collect().flatMap { r =>
      val ts = r.getSeq[String](1)
      val n = ts.indices.count { a =>
        if (ts(a) != phrase.head) false
        else {
          var prev = a
          var ok = true
          for (t <- phrase.tail) {
            val next = ((prev + 1) until ts.length).find(ts(_) == t)
            next match {
              case Some(p) => prev = p
              case None => ok = false; prev = ts.length + w + 1
            }
          }
          ok && (prev - a) <= w
        }
      }
      if (n > 0) Some(r.getLong(0) -> n.toLong) else None
    }.toMap
    val viaIndex = InvertedIndexOps
      .searchPhraseWindow(spark, "tidx_slop2", phrase, maxSpan = w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaIndex == brute)
    assert(viaIndex.nonEmpty, "fixture must contain sloppy matches")
    assert((viaIndex.keySet -- winK1.keySet).nonEmpty,
      "the slop must admit docs exact phrase misses")

    // batched ranks equal per-query ordering
    val qs = Seq((0L, phrase), (1L, Seq("batch", "scan")))
      .toDF("query_id", "terms")
    val ranked = InvertedIndexOps.searchPhraseWindowBatch(
      qs, spark, "tidx_slop2", topK = 5, maxSpan = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want0 = viaIndex.toSeq.sortBy { case (d, m) => (-m, d) }.take(5)
      .zipWithIndex.map { case ((d, _), i) => (0L, d, (i + 1).toLong) }
    assert(ranked.filter(_._1 == 0L).toSeq == want0)
  }

  test("positional streaming ingest: exactly-once across a checkpoint " +
    "restart, phrase results equal a one-shot index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("pidx-stream").toString
    val ckpt = s"$base/ckpt"
    val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    InvertedIndexOps.writePositionalIndex(store, spark, "pidx_str", base)
    val rows = delta.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (a, b) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String)]
    def start() = InvertedIndexOps.ingestPositionalStream(
      input.toDS().toDF("doc_id", "text"), spark, "pidx_str", ckpt)
    val q1 = start()
    try { input.addData(a.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { input.addData(b.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()
    // redelivery of a committed stream batch id appends nothing
    val n1 = spark.table("pidx_str").count()
    InvertedIndexOps.appendToPositionalIndex(
      delta.filter(pmod(col("doc_id"), lit(2)) === 0), spark, "pidx_str",
      batchTag = Some("stream-1"))
    assert(spark.table("pidx_str").count() == n1)
    val fullBase = Files.createTempDirectory("pidx-str-full").toString
    InvertedIndexOps.writePositionalIndex(docs, spark, "pidx_str_full",
      fullBase)
    val phrase = Seq("stream", "table", "hash")
    def res(t: String) = InvertedIndexOps
      .searchPhraseWindow(spark, t, phrase, maxSpan = 6)
      .orderBy("doc_id").collect().toSeq
    assert(res("pidx_str") == res("pidx_str_full"),
      "streamed positional index must match a clean one-shot build")
  }

  test("batched bm25 equals per-query searches, on both scan strategies") {
    import spark.implicits._
    val base = Files.createTempDirectory("tidx-batch").toString
    InvertedIndexOps.writeScoredIndex(docs, spark, "tidx_mq", base)
    val qs = Seq(
      (0L, Seq("batch", "scan", "hash")),
      (1L, Seq("Batch", "batch")), // case/dup normalization parity
      (2L, Seq("scan", "hash")),
      (3L, Seq("zzz-no-such-term", "batch"))) // absent terms contribute 0
    val queries = qs.toDF("query_id", "terms")
    def single(terms: Seq[String], qid: Long) = InvertedIndexOps
      .searchBm25(spark, "tidx_mq", terms, topK = 15)
      .collect().zipWithIndex
      .map { case (r, i) =>
        (qid, r.getLong(0), (i + 1).toLong, r.getDouble(1), r.getLong(2)) }
    val want = qs.flatMap { case (qid, terms) => single(terms, qid) }.toSet
    def got(maxPruned: Int) = InvertedIndexOps
      .searchBm25Batch(queries, spark, "tidx_mq", topK = 15,
        maxPrunedTerms = maxPruned)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSet
    assert(got(1024) == want, "pruned-scan batch must equal per-query runs")
    // force the join strategy (universe > maxPrunedTerms) — same answer
    assert(got(1) == want, "join-scan batch must equal per-query runs")
  }

  test("rebuild reclaims tombstoned and torn postings, keeps scores, " +
    "and the replay guard survives (ledger sums and tags untouched)") {
    val base = Files.createTempDirectory("tidx-rb").toString
    val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    InvertedIndexOps.writeScoredIndex(store, spark, "tidx_rb", base)
    InvertedIndexOps.appendToScoredIndex(delta, spark, "tidx_rb",
      batchTag = Some("b1"))
    // a torn attempt whose ledger row never landed…
    LayoutOps.appendBucketed(
      InvertedIndexOps.unifiedPostings(delta)
        .withColumn("__batch", lit("b2#torn")), spark, "tidx_rb")
    // …and a compliance delete whose postings linger physically
    val doomed = docs.filter(pmod(col("doc_id"), lit(7)) === 2)
      .select("doc_id")
    InvertedIndexOps.deleteFromTextIndex(doomed, spark, "tidx_rb")
    val terms = Seq("batch", "scan", "hash")
    val before = InvertedIndexOps
      .searchBm25(spark, "tidx_rb", terms, topK = 20).collect().toSeq
    val stBefore = spark.table("tidx_rb_stats")
      .agg(sum("n_docs"), sum("sum_dlen")).head()

    InvertedIndexOps.rebuildTextIndex(spark, "tidx_rb",
      Files.createTempDirectory("tidx-rb-new").toString)

    // reclaimed physically: no tombstoned doc's postings, no torn rows
    assert(spark.table("tidx_rb")
      .filter(pmod(col("doc_id"), lit(7)) === 2).count() == 0,
      "rebuild must drop tombstoned docs' postings")
    assert(spark.table("tidx_rb")
      .filter(col("__batch") === "b2#torn").count() == 0,
      "rebuild must drop uncommitted torn rows")
    // semantics preserved: scores and ledger sums identical
    assert(InvertedIndexOps.searchBm25(spark, "tidx_rb", terms, topK = 20)
      .collect().toSeq == before)
    val stAfter = spark.table("tidx_rb_stats")
      .agg(sum("n_docs"), sum("sum_dlen")).head()
    assert(stAfter.getLong(0) == stBefore.getLong(0) &&
      stAfter.getLong(1) == stBefore.getLong(1))
    // the replay guard survives the rebuild: a late redelivery of the
    // committed batch still appends nothing
    val n = spark.table("tidx_rb").count()
    InvertedIndexOps.appendToScoredIndex(delta, spark, "tidx_rb",
      batchTag = Some("b1"))
    assert(spark.table("tidx_rb").count() == n,
      "a replayed batch must stay a no-op after the rebuild")
    // …and a re-submitted delete stays idempotent
    InvertedIndexOps.deleteFromTextIndex(doomed, spark, "tidx_rb")
    assert(InvertedIndexOps.searchBm25(spark, "tidx_rb", terms, topK = 20)
      .collect().toSeq == before)
  }

  test("streaming ingest lands every batch exactly once across a " +
    "checkpoint restart; scores equal a clean one-shot index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("tidx-stream").toString
    val ckpt = s"$base/ckpt"
    val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    InvertedIndexOps.writeScoredIndex(store, spark, "tidx_str", base)

    val rows = delta.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (a, b) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, String)]
    def start() = InvertedIndexOps.ingestStream(
      input.toDS().toDF("doc_id", "text"), spark, "tidx_str", ckpt)
    val q1 = start()
    try { input.addData(a.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { input.addData(b.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()

    // a crash-between-append-and-checkpoint redelivery re-submits a
    // batch id the ledger has already committed: must be a no-op
    val n1 = spark.table("tidx_str").count()
    InvertedIndexOps.appendToScoredIndex(
      delta.filter(pmod(col("doc_id"), lit(2)) === 0), spark, "tidx_str",
      batchTag = Some("stream-1"))
    assert(spark.table("tidx_str").count() == n1,
      "a redelivered stream batch id must append nothing")

    val terms = Seq("batch", "scan", "hash")
    val fullBase = Files.createTempDirectory("tidx-str-full").toString
    InvertedIndexOps.writeScoredIndex(docs, spark, "tidx_str_full", fullBase)
    assert(InvertedIndexOps.searchBm25(spark, "tidx_str", terms, topK = 20)
      .collect().toSeq ==
      InvertedIndexOps.searchBm25(spark, "tidx_str_full", terms, topK = 20)
        .collect().toSeq,
      "streamed index must score exactly like a clean one-shot build")
  }

  test("RTBF reads the id-bucketed doc sidecar, never the postings: " +
    "the retraction scan is bucket-pruned by the requested ids") {
    val base = Files.createTempDirectory("tidx-side").toString
    InvertedIndexOps.writeScoredIndex(docs, spark, "tidx_side", base,
      nBuckets = 16)
    val someIds = docs.limit(3).collect().map(_.getLong(0)).toIndexedSeq
    val frame = InvertedIndexOps.rtbfDocFrame(spark, "tidx_side",
      Left(someIds))
    frame.collect()
    val plan = frame.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("tidx_side_docs"),
      s"retraction must read the doc sidecar:\n$plan")
    assert(!plan.contains("tidx_side/postings") &&
      !"""tidx_side[,\]\s]""".r.findFirstIn(
        plan.replace("tidx_side_docs", "").replace("tidx_side_stats", ""))
        .isDefined,
      s"retraction must not scan the postings:\n$plan")
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined && m.get.group(1).toInt <= 3,
      s"3 ids must prune the sidecar scan to <= 3 of 16 buckets:\n$plan")
  }

  test("zero-token docs retract their n_docs mass on delete " +
    "(they counted toward N at ingest)") {
    import spark.implicits._
    val base = Files.createTempDirectory("tidx-zero").toString
    val fixture = Seq(
      (1L, "batch scan hash"),
      (2L, "   "), // tokenizes to nothing — no postings, but N includes it
      (3L, "batch hash tables")).toDF("doc_id", "text")
    InvertedIndexOps.writeScoredIndex(fixture, spark, "tidx_zero", base)
    val n0 = spark.table("tidx_zero_stats").agg(sum("n_docs")).head().getLong(0)
    assert(n0 == 3L, "ingest counts zero-token docs toward N")
    InvertedIndexOps.deleteFromTextIndex(
      Seq(2L).toDF("doc_id"), spark, "tidx_zero")
    val n1 = spark.table("tidx_zero_stats").agg(sum("n_docs")).head().getLong(0)
    assert(n1 == 2L,
      "deleting a zero-token doc must retract its n_docs mass — " +
        "post-delete BM25's N must equal a from-scratch survivor index")
    // …and equality with the from-scratch survivor index holds end-to-end
    val cleanBase = Files.createTempDirectory("tidx-zero-clean").toString
    InvertedIndexOps.writeScoredIndex(
      fixture.filter(col("doc_id") =!= 2L), spark, "tidx_zclean", cleanBase)
    val terms = Seq("batch", "hash")
    assert(InvertedIndexOps.searchBm25(spark, "tidx_zero", terms, topK = 5)
      .collect().toSeq ==
      InvertedIndexOps.searchBm25(spark, "tidx_zclean", terms, topK = 5)
        .collect().toSeq)
  }

  test("a k-term query scans only the terms' buckets") {
    val base = Files.createTempDirectory("tidx-prune").toString
    InvertedIndexOps.writeTextIndex(docs, spark, "tidx_prune", base,
      nBuckets = 16)
    val df = InvertedIndexOps.searchAllTerms(
      spark, "tidx_prune", Seq("batch", "scan", "hash"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"scan must be bucket-pruned:\n$plan")
    assert(m.get.group(1).toInt <= 3 && m.get.group(2).toInt == 16,
      s"3 terms must select <= 3 of 16 buckets: ${m.get.matched}")
  }

  test("WAND pruning: pruned top-k (scores, ranks, matched) equals the " +
    "full evaluation on stopword, tie, all-stop and refusal adversaries") {
    import spark.implicits._
    val base = Files.createTempDirectory("tidx-wand").toString
    // 'the'/'of' in EVERY doc (the stopwords); 'zebra' in 5, 'quark' in
    // 3 (the discriminators); zebra docs carry DIFFERENT stopword
    // frequencies so a skipped probe would mis-order them; docs 9-20
    // are byte-identical (score ties, broken by doc_id); 21+ are
    // stopword-only background a wrong pruning would surface
    val fixture = (Seq(
      (1L, "the of zebra"),
      (2L, "the the the of zebra pad1 pad2"),
      (3L, "of of zebra the the"),
      (4L, "zebra the of padx pady padz padw"),
      (5L, "zebra of the"),
      (6L, "quark the of"),
      (7L, "quark quark of the"),
      (8L, "quark of the")) ++
      (9L to 20L).map(i => (i, "the of common words here")) ++
      (21L to 60L).map(i => (i, s"the of w$i x$i"))).toDF("doc_id", "text")
    InvertedIndexOps.writeScoredIndex(fixture, spark, "tidx_wand", base)
    val queries = Seq(
      (0L, Seq("zebra", "the", "of")),   // mixed: prune + accept
      (1L, Seq("the", "of")),            // all-stop: routed to full
      (2L, Seq("quark")),                // essential-only
      (3L, Seq("zebra", "missing")),     // absent term
      (4L, Seq("quark", "the"))).toDF("query_id", "terms")
    def run(k: Int, frac: Double) = {
      val (df, route) = InvertedIndexOps.searchBm25BatchDiag(
        queries, spark, "tidx_wand", topK = k, stopDfFrac = frac)
      (df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).sortBy(t => (t._1, t._3)).toSeq,
        route)
    }
    val (got, route) = run(3, 0.5)
    val (want, routeU) = run(3, 1.1) // stopDfFrac ≥ 1 disables pruning
    assert(routeU == "full-in", routeU)
    assert(route.startsWith("pruned") && route.contains("allstop"),
      s"pruning must engage and route the all-stop query: $route")
    assert(!route.contains("fallback"),
      s"the k=3 adversaries must be ACCEPTED (kth clears the bound): $route")
    assert(got == want, s"pruned != full at k=3:\n$got\n$want")
    // refusal: k exceeds the candidate count, so an only-stopword doc
    // COULD belong in the top-k — acceptance must fail and the
    // fallback reproduce the full answer
    val (got50, route50) = run(50, 0.5)
    val (want50, _) = run(50, 1.1)
    assert(route50.contains("fallback"),
      s"k=50 must refuse the pruned answer: $route50")
    assert(got50 == want50, "refused queries must re-run exactly")
    // the cost-model floor: a batch whose mixed-query share is under
    // 10% routes WHOLE to the full plan (all-stop queries cost the
    // same either way; the pruned tier's orchestration jobs only get
    // spent where stopword fan-out is avoidable) — same answers
    val manyStop = (Seq((100L, Seq("zebra", "the"))) ++
      (101L to 119L).map(i => (i, Seq("the", "of"))))
      .toDF("query_id", "terms")
    def runMany(frac: Double) = {
      val (df, route) = InvertedIndexOps.searchBm25BatchDiag(
        manyStop, spark, "tidx_wand", topK = 3, stopDfFrac = frac)
      (df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).sortBy(t => (t._1, t._3)).toSeq,
        route)
    }
    val (gotM, routeM) = runMany(0.5)
    assert(routeM == "full-in",
      s"a 5%-mixed batch must route whole to the full plan: $routeM")
    assert(gotM == runMany(1.1)._1)

    // bounds survive a delete (ledger-subtracted, never under-bounding):
    // drop two zebra docs and compare again
    InvertedIndexOps.deleteFromTextIndex(
      Seq(2L, 4L).toDF("doc_id"), spark, "tidx_wand")
    val (gotD, routeD) = run(3, 0.5)
    val (wantD, _) = run(3, 1.1)
    assert(routeD.startsWith("pruned"), routeD)
    assert(gotD == wantD, "pruned != full after RTBF")
  }

  test("as-of search: later appends vanish and later deletes un-happen " +
    "at an earlier ledger seq; rebuild is the loud time-travel floor") {
    import spark.implicits._
    val base = Files.createTempDirectory("tidx-asof").toString
    val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    InvertedIndexOps.writeScoredIndex(store, spark, "tidx_asof", base)
    val atSeed = InvertedIndexOps.currentLedgerSeq(spark, "tidx_asof")
    InvertedIndexOps.appendToScoredIndex(delta, spark, "tidx_asof",
      batchTag = Some("b1"))
    val atFull = InvertedIndexOps.currentLedgerSeq(spark, "tidx_asof")
    val doomed = docs.filter(pmod(col("doc_id"), lit(7)) === 2)
      .select("doc_id")
    InvertedIndexOps.deleteFromTextIndex(doomed, spark, "tidx_asof")
    val terms = Seq("batch", "scan", "hash")
    def res(asOf: Option[Long]) = InvertedIndexOps
      .searchBm25(spark, "tidx_asof", terms, topK = 20, asOfSeq = asOf)
      .collect().toSeq
    // as-of the pre-delete commit ≡ a fresh index over the full corpus
    val fullBase = Files.createTempDirectory("tidx-asof-full").toString
    InvertedIndexOps.writeScoredIndex(docs, spark, "tidx_asof_f", fullBase)
    assert(res(Some(atFull)) ==
      InvertedIndexOps.searchBm25(spark, "tidx_asof_f", terms, topK = 20)
        .collect().toSeq,
      "as-of pre-delete must equal a clean full-corpus index")
    // as-of the seed commit ≡ a fresh index over the seed alone
    val seedBase = Files.createTempDirectory("tidx-asof-seed").toString
    InvertedIndexOps.writeScoredIndex(store, spark, "tidx_asof_s", seedBase)
    assert(res(Some(atSeed)) ==
      InvertedIndexOps.searchBm25(spark, "tidx_asof_s", terms, topK = 20)
        .collect().toSeq,
      "as-of the seed must un-happen both the append and the delete")
    // current read still shows the post-delete world
    val survBase = Files.createTempDirectory("tidx-asof-surv").toString
    InvertedIndexOps.writeScoredIndex(
      docs.filter(pmod(col("doc_id"), lit(7)) =!= 2), spark,
      "tidx_asof_v", survBase)
    assert(res(None) ==
      InvertedIndexOps.searchBm25(spark, "tidx_asof_v", terms, topK = 20)
        .collect().toSeq)
    // the BATCH path time-travels identically (routed to the full
    // plan: the bound sidecar describes the CURRENT index, so a
    // historical read never prunes)
    val qs = Seq((0L, terms), (1L, Seq("batch", "hash")))
      .toDF("query_id", "terms")
    val (batchAt, routeAt) = InvertedIndexOps.searchBm25BatchDiag(
      qs, spark, "tidx_asof", topK = 20, asOfSeq = Some(atFull))
    assert(routeAt == "full-in", routeAt)
    val got0 = batchAt.filter(col("query_id") === 0L)
      .select("doc_id", "score", "matched")
      .orderBy(desc("score"), col("doc_id")).collect().toSeq
    assert(got0 == InvertedIndexOps
      .searchBm25(spark, "tidx_asof", terms, topK = 20,
        asOfSeq = Some(atFull)).collect().toSeq,
      "batched as-of must equal the per-query as-of search")
    // out-of-range seqs fail loudly
    intercept[IllegalArgumentException] { res(Some(0L)) }
    intercept[IllegalArgumentException] { res(Some(999L)) }
    // the rebuild collapses history: older as-of reads become
    // unanswerable (physically reclaimed) and must say so
    InvertedIndexOps.rebuildTextIndex(spark, "tidx_asof",
      Files.createTempDirectory("tidx-asof-rb").toString)
    val e = intercept[IllegalArgumentException] { res(Some(atFull)) }
    assert(e.getMessage.contains("predates the last rebuild"), e.getMessage)
    // …while the current read is untouched by the barrier
    assert(res(None) ==
      InvertedIndexOps.searchBm25(spark, "tidx_asof_v", terms, topK = 20)
        .collect().toSeq)
  }

  test("pre-sidecar index: delete and rebuild fail with the migration " +
    "story, not a bare missing-table error") {
    import spark.implicits._
    val base = Files.createTempDirectory("tidx-presc").toString
    InvertedIndexOps.writeScoredIndex(docs.limit(50), spark,
      "tidx_presc", base)
    // simulate an index persisted before the r14 sidecar format
    spark.sql("DROP TABLE tidx_presc_docs")
    val e1 = intercept[IllegalArgumentException] {
      InvertedIndexOps.deleteFromTextIndex(
        Seq(1L).toDF("doc_id"), spark, "tidx_presc")
    }
    assert(e1.getMessage.contains("doc sidecar"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      InvertedIndexOps.rebuildTextIndex(spark, "tidx_presc",
        Files.createTempDirectory("tidx-presc2").toString)
    }
    assert(e2.getMessage.contains("doc sidecar"), e2.getMessage)
  }
}
