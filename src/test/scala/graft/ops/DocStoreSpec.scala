package graft.ops

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[DocStoreOps]] — the gate (store_cdc / store_lookup) hash-compares
  * the applied store against DuckDB's one-shot LWW recompute; this spec
  * pins what the oracle can't see: the election tie rules, idempotent
  * re-apply, bucket-local rewrites, lookup file pruning, and streaming
  * ingest parity with the one-shot batch apply. */
case class CdcChange(k: Long, v: String, seq: Long, op: String)

class DocStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(base: String): Set[(Long, String, Long)] =
    DocStoreOps.readDocStore(spark, base)
      .select("k", "v", "seq").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("LWW election: update, delete, delete-wins-tie, stale loses, insert") {
    val base = Files.createTempDirectory("docstore-lww").toString
    val store = Seq(
      (1L, "one", 10L), (2L, "two", 10L), (3L, "three", 10L), (4L, "four", 10L)
    ).toDF("k", "v", "seq")
    DocStoreOps.writeDocStore(store, spark, base, "k", "seq", 8)
    val changes = Seq(
      CdcChange(1L, "one'", 20L, "U"),   // plain update
      CdcChange(2L, "dead", 20L, "D"),   // plain delete
      CdcChange(3L, "tie", 10L, "U"),    // ties the STORE row: update at
      CdcChange(3L, "tie", 10L, "D"),    //   equal seq loses to delete
      CdcChange(4L, "stale", 5L, "U"),   // older than the store: loses
      CdcChange(5L, "five", 20L, "U"),   // fresh insert
      CdcChange(5L, "older", 15L, "U")   // within-batch LWW: loses to 20
    ).toDF("k", "v", "seq", "op")
    DocStoreOps.applyChanges(changes, spark, base, "k", "seq", "op", 8)
    val want = Set(
      (1L, "one'", 20L), (4L, "four", 10L), (5L, "five", 20L))
    assert(rows(base) == want)
    // re-applying the SAME batch is a no-op (at-least-once safety)
    DocStoreOps.applyChanges(changes, spark, base, "k", "seq", "op", 8)
    assert(rows(base) == want)
  }

  test("an apply rewrites only the winners' buckets") {
    val base = Files.createTempDirectory("docstore-loc").toString
    val docs = graft.queries.tDocs(spark, sfTiny)
      .select(col("doc_id").as("k"), col("lang").as("v"),
        col("doc_id").as("seq"))
    DocStoreOps.writeDocStore(docs, spark, base, "k", "seq", 8)
    def bucketFiles: Map[String, Map[String, Long]] =
      new File(base).listFiles().filter(_.getName.startsWith("__bucket="))
        .map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => f.getName -> f.lastModified()).toMap
        }.toMap
    val before = bucketFiles
    assert(before.size == 8, s"expected 8 bucket dirs: ${before.keySet}")
    val change = Seq(CdcChange(7L, "upd", Long.MaxValue, "U"))
      .toDF("k", "v", "seq", "op")
    DocStoreOps.applyChanges(change, spark, base, "k", "seq", "op", 8)
    val after = bucketFiles
    val touched = "__bucket=" + spark.range(1)
      .select(pmod(hash(lit(7L)), lit(8))).head().getInt(0)
    assert(after(touched) != before(touched), "the key's bucket must change")
    (before.keySet - touched).foreach { b =>
      assert(after(b) == before(b),
        s"unaffected bucket $b was rewritten: ${before(b)} -> ${after(b)}")
    }
    assert(DocStoreOps.readDocStore(spark, base)
      .filter(col("k") === 7L).select("v").head().getString(0) == "upd")
  }

  test("lookup scans only the requested keys' buckets") {
    val base = Files.createTempDirectory("docstore-lk").toString
    val docs = graft.queries.tDocs(spark, sfTiny)
      .select(col("doc_id").as("k"), col("lang").as("v"),
        col("doc_id").as("seq"))
    DocStoreOps.writeDocStore(docs, spark, base, "k", "seq", 16)
    val nDirs = new File(base).listFiles()
      .count(_.getName.startsWith("__bucket="))
    assert(nDirs == 16)
    val df = DocStoreOps.lookup(spark, base, "k", 7L, 16)
    val got = df.collect()
    assert(got.length == 1 && got.head.getAs[Long]("k") == 7L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("__bucket"),
      s"lookup must carry a partition filter:\n${plan.take(1200)}")
    // one key → one bucket dir listed; each dir holds >=1 file, and only
    // that dir's files may be scanned. The join makes the plan adaptive,
    // so unwrap AdaptiveSparkPlanExec before collecting scan leaves.
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectLeaves().flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          leaves(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          leaves(q.plan)
        case l => Seq(l)
      }
    val scanned = leaves(df.queryExecution.executedPlan).flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(base)) =>
        f.metrics.get("numFiles").map(_.value)
      case _ => None
    }.sum
    val touched = "__bucket=" + spark.range(1)
      .select(pmod(hash(lit(7L)), lit(16))).head().getInt(0)
    val dirFiles = new File(s"$base/$touched").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(scanned == dirFiles,
      s"expected only $touched's $dirFiles file(s) scanned, got $scanned")
  }

  test("attr index: stale postings read-repair away; lookups prune both " +
    "the index and the primary") {
    val base = Files.createTempDirectory("docstore-ai").toString
    val idx = Files.createTempDirectory("docstore-ai-idx").toString
    val store = Seq(
      (1L, "red", 10L), (2L, "red", 10L), (3L, "blue", 10L), (4L, "blue", 10L)
    ).toDF("k", "v", "seq")
    DocStoreOps.writeDocStore(store, spark, base, "k", "seq", 8)
    DocStoreOps.buildAttrIndex(spark, base, idx, "k", "v", 8)
    // wave: key 1 red→blue (stale 'red' posting), key 2 deleted (stale
    // posting), key 5 inserted blue
    val wave = Seq(
      CdcChange(1L, "blue", 20L, "U"),
      CdcChange(2L, "red", 20L, "D"),
      CdcChange(5L, "blue", 20L, "U")).toDF("k", "v", "seq", "op")
    DocStoreOps.applyChangesIndexed(wave, spark, base, idx,
      "k", "seq", "op", "v", 8)
    def byAttr(vs: String*): Set[Long] =
      DocStoreOps.lookupByAttr(spark, base, idx, "k", "v",
        vs.toDF("v"), 8).select("k").collect().map(_.getLong(0)).toSet
    assert(byAttr("blue") == Set(1L, 3L, 4L, 5L),
      "new postings found; moved key under its new attr")
    assert(byAttr("red") == Set.empty[Long],
      "stale postings (moved key, deleted key) must repair away")
    // the index side carries a bucket partition filter
    val df = DocStoreOps.lookupByAttr(spark, base, idx, "k", "v",
      Seq("blue").toDF("v"), 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__bucket"),
      s"attr lookup must prune index buckets:\n${plan.take(1200)}")
  }

  test("a batch may widen the schema; pre-evolution rows read as null") {
    val base = Files.createTempDirectory("docstore-evolve").toString
    DocStoreOps.writeDocStore(
      Seq((1L, "one", 10L), (2L, "two", 10L)).toDF("k", "v", "seq"),
      spark, base, "k", "seq", 4)
    DocStoreOps.applyChanges(
      Seq((2L, "two'", 20L, "U", "extra2"), (3L, "three", 20L, "U", "extra3"))
        .toDF("k", "v", "seq", "op", "w"),
      spark, base, "k", "seq", "op", 4)
    val got = DocStoreOps.readDocStore(spark, base)
      .select("k", "v", "seq", "w").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)))).toSet
    assert(got == Set(
      (1L, "one", 10L, None), // untouched bucket, pre-evolution schema
      (2L, "two'", 20L, Some("extra2")),
      (3L, "three", 20L, Some("extra3"))))
    // the widened column participates in lookups too
    val lk = DocStoreOps.lookup(spark, base, "k", 3L, 4)
      .select("w").head().getString(0)
    assert(lk == "extra3")
  }

  test("compaction drops tombstones and empties all-tombstone buckets") {
    val base = Files.createTempDirectory("docstore-compact").toString
    // keys 1,2 share bucket-mates; key 3 alone in its bucket (probe)
    val probe = spark.range(50).select(col("id"),
      pmod(hash(col("id")), lit(4)).as("b")).collect()
    val loner = probe.groupBy(_.getInt(1)).values.find(_.size == 1)
      .orElse(probe.groupBy(_.getInt(1)).values.headOption).get.head.getLong(0)
    val others = probe.filter(r =>
      r.getInt(1) != probe.find(_.getLong(0) == loner).get.getInt(1))
      .take(2).map(_.getLong(0))
    val init = (others :+ loner).toSeq.map(k => (k, s"v$k", 10L))
      .toDF("k", "v", "seq")
    DocStoreOps.writeDocStore(init, spark, base, "k", "seq", 4)
    val dels = Seq((others.head, "x", 20L, "D"), (loner, "x", 20L, "D"))
      .toDF("k", "v", "seq", "op")
    DocStoreOps.applyChanges(dels, spark, base, "k", "seq", "op", 4)
    val visible = rows(base)
    // tombstones are physically present pre-compaction
    assert(spark.read.parquet(base).filter(col("__op") === "D").count() == 2)
    DocStoreOps.compactDocStore(spark, base)
    assert(rows(base) == visible, "compaction must not change visible rows")
    assert(spark.read.parquet(base).filter(col("__op") === "D").count() == 0)
    // a post-compaction stale update CAN resurrect — the documented trade
    DocStoreOps.applyChanges(
      Seq((others.head, "back", 15L, "U")).toDF("k", "v", "seq", "op"),
      spark, base, "k", "seq", "op", 4)
    assert(rows(base).contains((others.head, "back", 15L)))
  }

  test("purge removes matching rows bucket-locally; null predicate keeps") {
    val base = Files.createTempDirectory("docstore-purge").toString
    val docs = graft.queries.tDocs(spark, sfTiny)
      .select(col("doc_id").as("k"), col("lang").as("v"),
        col("doc_id").as("seq"))
    DocStoreOps.writeDocStore(docs, spark, base, "k", "seq", 8)
    def bucketFiles: Map[String, Map[String, Long]] =
      new File(base).listFiles().filter(_.getName.startsWith("__bucket="))
        .map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => f.getName -> f.lastModified()).toMap
        }.toMap
    val before = bucketFiles
    val nBefore = DocStoreOps.readDocStore(spark, base).count()
    val purgeKeys = docs.filter(col("v") === "zh")
    val nPurge = purgeKeys.count()
    assert(nPurge > 0 && nPurge < nBefore)
    val hitBuckets = purgeKeys
      .select(pmod(hash(col("k")), lit(8)).as("b")).distinct()
      .collect().map("__bucket=" + _.getInt(0)).toSet
    DocStoreOps.purgeWhere(spark, base, col("v") === "zh")
    val after = bucketFiles
    (before.keySet -- hitBuckets).foreach { b =>
      assert(after(b) == before(b), s"unaffected bucket $b was rewritten")
    }
    val left = DocStoreOps.readDocStore(spark, base)
    assert(left.count() == nBefore - nPurge)
    assert(left.filter(col("v") === "zh").count() == 0)
    // a predicate that evaluates to null must not delete
    DocStoreOps.purgeWhere(spark, base,
      when(col("v") === "en", lit(null).cast("boolean")))
    assert(DocStoreOps.readDocStore(spark, base).count() == nBefore - nPurge)
  }

  test("a streamed changelog with expectations quarantines continuously") {
    val base = Files.createTempDirectory("docstore-stq").toString
    val dlq = Files.createTempDirectory("docstore-stq-dlq").toString
    DocStoreOps.writeDocStore(
      Seq((1L, "one", 10L)).toDF("k", "v", "seq"),
      spark, base, "k", "seq", 8)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[CdcChange]
    val q = DocStoreOps.cdcSink(input.toDF(), base, "k", "seq", "op", 8,
      expectations = Seq("no_bad" -> (col("v") =!= "bad")),
      quarantinePath = Some(dlq))
    try {
      input.addData(CdcChange(1L, "bad", 20L, "U"), CdcChange(2L, "two", 20L, "U"))
      q.processAllAvailable()
      input.addData(CdcChange(3L, "bad", 30L, "U")); q.processAllAvailable()
    } finally q.stop()
    assert(rows(base) == Set((1L, "one", 10L), (2L, "two", 20L)))
    val dlqRows = spark.read.parquet(dlq).select("k").collect()
      .map(_.getLong(0)).toSet
    assert(dlqRows == Set(1L, 3L))
  }

  test("streamed CDC micro-batches land exactly like one batch apply") {
    val baseStream = Files.createTempDirectory("docstore-st").toString
    val baseBatch = Files.createTempDirectory("docstore-bt").toString
    val init = Seq((1L, "one", 10L), (2L, "two", 10L)).toDF("k", "v", "seq")
    DocStoreOps.writeDocStore(init, spark, baseStream, "k", "seq", 8)
    DocStoreOps.writeDocStore(init, spark, baseBatch, "k", "seq", 8)

    val b1 = Seq(CdcChange(1L, "one'", 20L, "U"), CdcChange(3L, "three", 20L, "U"))
    val b2 = Seq(CdcChange(2L, "gone", 30L, "D"), CdcChange(3L, "stale", 15L, "U"))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcChange]
    val q = DocStoreOps.cdcSink(input.toDF(), baseStream, "k", "seq", "op", 8)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    DocStoreOps.applyChanges((b1 ++ b2).toDF("k", "v", "seq", "op"),
      spark, baseBatch, "k", "seq", "op", 8)
    assert(rows(baseStream) == rows(baseBatch))
    assert(rows(baseStream) ==
      Set((1L, "one'", 20L), (3L, "three", 20L)))
  }
}
