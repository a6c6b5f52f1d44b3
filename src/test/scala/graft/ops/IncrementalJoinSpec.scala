package graft.ops

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[IncrementalJoinOps]] — the gate (join_view_inc) hash-compares the
  * maintained view against DuckDB's one-shot join; this spec pins the
  * delta-join mechanics the oracle can't see: all four old/new pair
  * combinations land exactly once, and a refresh APPENDS without ever
  * touching existing files or unaffected buckets. */
class IncrementalJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("delta join emits each old/new pair combination exactly once") {
    val base = Files.createTempDirectory("jview-val").toString
    // key 1: old-old; key 2: oldA-newB; key 3: newA-oldB; key 4: new-new;
    // key 5: newA with no B ever (no row); key 2 also gets a SECOND new
    // B row (dup multiplicity)
    val a0 = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val b0 = Seq((1L, "b1"), (3L, "b3")).toDF("k", "bv")
    val dA = Seq((3L, "a3"), (4L, "a4"), (5L, "a5")).toDF("k", "av")
    val dB = Seq((2L, "b2"), (2L, "b2x"), (4L, "b4")).toDF("k", "bv")
    IncrementalJoinOps.writeJoinView(a0, b0, spark, base, "k", 8)
    IncrementalJoinOps.appendToJoinView(dA, dB, spark, base, "k", 8)
    val got = IncrementalJoinOps.readJoinView(spark, base)
      .select("k", "av", "bv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    val want = Seq((1L, "a1", "b1"), (2L, "a2", "b2"), (2L, "a2", "b2x"),
      (3L, "a3", "b3"), (4L, "a4", "b4"))
    assert(got == want, s"got $got")
    // and it equals the from-scratch join
    val full = a0.union(dA).join(b0.union(dB), "k")
      .select("k", "av", "bv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(got == full)
  }

  test("a refresh only appends, and only in the deltas' buckets") {
    val base = Files.createTempDirectory("jview-loc").toString
    val orders = graft.queries.t(spark, sfTiny, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val li = graft.queries.t(spark, sfTiny, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber"))
    IncrementalJoinOps.writeJoinView(orders, li, spark, base, "k", 8)
    def files(sub: String): Map[String, Long] = {
      def walk(f: File): Seq[File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new File(s"$base/$sub")).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = Seq("a", "b", "j").map(s => s -> files(s)).toMap
    // one new A row for one key; no B delta
    val dA = Seq((7L, "X")).toDF("k", "o_orderpriority")
    val dB = li.filter(lit(false))
    IncrementalJoinOps.appendToJoinView(dA, dB, spark, base, "k", 8)
    val after = Seq("a", "b", "j").map(s => s -> files(s)).toMap
    // every pre-existing file byte-untouched (append-only refresh)
    Seq("a", "b", "j").foreach { s =>
      before(s).foreach { case (p, m) =>
        assert(after(s).get(p).contains(m), s"$p was modified")
      }
    }
    // new files appear only under the delta's bucket in a/ and j/
    val bk = spark.range(1).select(pmod(hash(lit(7L)), lit(8))).head().getInt(0)
    val newFiles = Seq("a", "j").flatMap(s =>
      (after(s).keySet -- before(s).keySet).map(s -> _))
    assert(newFiles.nonEmpty)
    newFiles.foreach { case (s, p) =>
      assert(p.contains(s"__bucket=$bk"), s"unexpected new file $p in $s/")
    }
    assert((after("b").keySet -- before("b").keySet).isEmpty,
      "empty B delta must write nothing")
    // the view gained exactly the new pairs
    val gained = IncrementalJoinOps.readJoinView(spark, base)
      .filter(col("k") === 7L && col("o_orderpriority") === "X").count()
    assert(gained == li.filter(col("k") === 7L).count())
  }

  test("a streamed A-side delta maintains the same view as batch folds") {
    val base = Files.createTempDirectory("jview-st").toString
    val a0 = Seq((1L, "a1")).toDF("k", "av")
    val b0 = Seq((1L, "b1"), (2L, "b2"), (3L, "b3")).toDF("k", "bv")
    IncrementalJoinOps.writeJoinView(a0, b0, spark, base, "k", 8)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = IncrementalJoinOps.joinViewSinkA(
      input.toDF().toDF("k", "av"), base, "k", 8,
      checkpoint = Files.createTempDirectory("jview-st-ckpt").toString)
    try {
      input.addData((2L, "a2")); q.processAllAvailable()
      input.addData((3L, "a3"), (4L, "a4")); q.processAllAvailable()
    } finally q.stop()
    val got = IncrementalJoinOps.readJoinView(spark, base)
      .select("k", "av", "bv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "a1", "b1"), (2L, "a2", "b2"), (3L, "a3", "b3")))
  }

  test("a redelivered micro-batch is skipped by the tag ledger — the " +
    "view's multiset appends must not double") {
    val base = Files.createTempDirectory("jview-rp").toString
    val a0 = Seq((1L, "a1")).toDF("k", "av")
    val b0 = Seq((1L, "b1"), (2L, "b2")).toDF("k", "bv")
    IncrementalJoinOps.writeJoinView(a0, b0, spark, base, "k", 8)
    val delta = Seq((2L, "a2")).toDF("k", "av")
    assert(IncrementalJoinOps.appendSideATagged(
      delta, spark, base, "k", 8, tag = 0L), "first delivery applies")
    def rows() = IncrementalJoinOps.readJoinView(spark, base)
      .select("k", "av", "bv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      .sorted
    val afterFirst = rows()
    assert(afterFirst == Seq((1L, "a1", "b1"), (2L, "a2", "b2")))
    // the crash-redelivery: same batch, same batchId
    assert(!IncrementalJoinOps.appendSideATagged(
      delta, spark, base, "k", 8, tag = 0L), "replay must be skipped")
    assert(rows() == afterFirst,
      "a replayed delta must not double its join rows")
    // a NEW batch id still applies
    assert(IncrementalJoinOps.appendSideATagged(
      Seq((1L, "a1x")).toDF("k", "av"), spark, base, "k", 8, tag = 1L))
    assert(rows().size == 3)
  }

  test("an empty join view reads as zero rows, and the fact-stream-" +
    "before-dimension pattern works (B loads later)") {
    val base = Files.createTempDirectory("jview-empty").toString
    val a0 = Seq((1L, "a1")).toDF("k", "av")
    val bEmpty = Seq.empty[(Long, String)].toDF("k", "bv")
    // initial join is empty (no B data yet): readable, not an error
    IncrementalJoinOps.writeJoinView(a0, bEmpty, spark, base, "k", 4)
    assert(IncrementalJoinOps.readJoinView(spark, base).count() == 0)
    // fact batches stream in FIRST (tagged path must get B's schema
    // from the side-car, not from listing nonexistent live dirs)...
    assert(IncrementalJoinOps.appendSideATagged(
      Seq((2L, "a2")).toDF("k", "av"), spark, base, "k", 4, tag = 0L))
    assert(IncrementalJoinOps.readJoinView(spark, base).count() == 0)
    // ...and the dimension arrives later through the batch API
    IncrementalJoinOps.appendToJoinView(
      a0.filter(lit(false)), Seq((2L, "b2")).toDF("k", "bv"),
      spark, base, "k", 4)
    val got = IncrementalJoinOps.readJoinView(spark, base)
      .select("k", "av", "bv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((2L, "a2", "b2")))
    // a data column named after a layout partition column is rejected
    val err = intercept[IllegalArgumentException] {
      IncrementalJoinOps.writeJoinView(
        Seq((1L, "x")).toDF("k", "c"), bEmpty, spark,
        Files.createTempDirectory("jview-resv").toString, "k", 4)
    }
    assert(err.getMessage.contains("reserved"))
  }

  test("a torn apply (commit dirs written, manifest not) is invisible; " +
    "the retry overwrites it") {
    val base = Files.createTempDirectory("jview-torn").toString
    val a0 = Seq((1L, "a1")).toDF("k", "av")
    val b0 = Seq((1L, "b1"), (2L, "b2")).toDF("k", "bv")
    IncrementalJoinOps.writeJoinView(a0, b0, spark, base, "k", 4)
    def view() = IncrementalJoinOps.readJoinView(spark, base)
      .select("k", "av", "bv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val committed = view()
    // simulate the crash mid-apply: the NEXT commit's j/ and a/ dirs
    // land (with deliberately wrong content) but the manifest append
    // never happens
    Seq((9L, "aX", "bX")).toDF("k", "av", "bv")
      .withColumn("__bucket", lit(0))
      .write.partitionBy("__bucket").parquet(s"$base/j/c=1")
    Seq((9L, "aX")).toDF("k", "av")
      .withColumn("__bucket", lit(0))
      .write.partitionBy("__bucket").parquet(s"$base/a/c=1")
    assert(view() == committed,
      "uncommitted commit directories must be invisible")
    // the retry lands on the same commit id, overwriting the torn dirs
    IncrementalJoinOps.appendToJoinView(
      Seq((2L, "a2")).toDF("k", "av"), b0.filter(lit(false)),
      spark, base, "k", 4)
    assert(view() == committed + ((2L, "a2", "b2")),
      "the retried apply must publish exactly its own rows")
  }

  test("deferred-GC compaction + vacuum: superseded dirs survive the " +
    "swap, the sweep reclaims exactly the orphans") {
    val base = Files.createTempDirectory("jview-vac").toString
    val a0 = Seq((1L, "a1")).toDF("k", "av")
    val b0 = Seq((1L, "b1")).toDF("k", "bv")
    IncrementalJoinOps.writeJoinView(a0, b0, spark, base, "k", 4)
    (2 to 7).foreach { i =>
      IncrementalJoinOps.appendToJoinView(
        Seq((1L, s"a$i")).toDF("k", "av"), b0.filter(lit(false)),
        spark, base, "k", 4)
    }
    def dataDirs(side: String): Set[String] = {
      val root = new File(s"$base/$side")
      if (!root.exists()) Set.empty
      else root.listFiles().toSet
        .filter((c: File) => c.isDirectory && c.getName.startsWith("c="))
        .flatMap((c: File) => c.listFiles().toSet
          .filter((d: File) => d.isDirectory && d.getName.startsWith("__bucket="))
          .map((d: File) => s"${c.getName}/${d.getName}"))
    }
    val beforeCompact = dataDirs("a")
    IncrementalJoinOps.compactJoinView(spark, base,
      maxFilesPerBucket = 1, gc = false)
    // deferred: superseded dirs still on disk alongside the new commit
    assert(dataDirs("a").size > beforeCompact.size,
      "gc=false must leave the superseded dirs in place")
    val view = IncrementalJoinOps.readJoinView(spark, base)
      .collect().map(_.toSeq).toSet
    IncrementalJoinOps.vacuumJoinView(spark, base)
    assert(IncrementalJoinOps.readJoinView(spark, base)
      .collect().map(_.toSeq).toSet == view,
      "vacuum must not change the committed view")
    // post-vacuum: every remaining dir is manifest-live (compacted
    // buckets have exactly one commit dir left)
    assert(dataDirs("a").size < beforeCompact.size)
  }

  test("compaction collapses fragmented buckets only, data unchanged") {
    val base = Files.createTempDirectory("jview-cmp").toString
    val a0 = Seq((1L, "a1")).toDF("k", "av")
    val b0 = Seq((1L, "b1")).toDF("k", "bv")
    IncrementalJoinOps.writeJoinView(a0, b0, spark, base, "k", 4)
    // six refreshes on the SAME key fragment one bucket of a/ and j/
    (2 to 7).foreach { i =>
      IncrementalJoinOps.appendToJoinView(
        Seq((1L, s"a$i")).toDF("k", "av"), b0.filter(lit(false)),
        spark, base, "k", 4)
    }
    def bucketFiles(side: String): Map[String, Set[String]] =
      new File(s"$base/$side").listFiles()
        .filter(c => c.isDirectory && c.getName.startsWith("c="))
        .flatMap { c =>
          c.listFiles().filter(_.getName.startsWith("__bucket="))
            .map(d => d.getName -> d.listFiles()
              .filter(_.getName.endsWith(".parquet"))
              .map(f => s"${c.getName}/${f.getName}").toSet)
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).reduce(_ ++ _)).toMap
    val hot = "__bucket=" + spark.range(1)
      .select(pmod(hash(lit(1L)), lit(4))).head().getInt(0)
    val beforeData = IncrementalJoinOps.readJoinView(spark, base)
      .collect().map(_.toSeq).toSet
    val beforeA = bucketFiles("a")
    assert(beforeA(hot).size == 7, s"expected fragmentation: $beforeA")
    IncrementalJoinOps.compactJoinView(spark, base, maxFilesPerBucket = 4)
    val afterA = bucketFiles("a")
    assert(afterA(hot).size == 1, s"hot bucket must collapse: $afterA")
    // untouched buckets keep their exact files
    (beforeA.keySet - hot).foreach(bk => assert(afterA(bk) == beforeA(bk)))
    assert(IncrementalJoinOps.readJoinView(spark, base)
      .collect().map(_.toSeq).toSet == beforeData)
    assert(bucketFiles("j")(hot).size == 1)
  }

  test("a manifest swap torn mid-write leaves the prior committed view " +
    "live; refreshes and the next compaction still work") {
    val base = Files.createTempDirectory("jview-torn-swap").toString
    val a0 = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val b0 = Seq((1L, "b1"), (2L, "b2")).toDF("k", "bv")
    IncrementalJoinOps.writeJoinView(a0, b0, spark, base, "k", 4)
    // fragment a bucket, then compact: a real swap has happened
    (3 to 8).foreach { i =>
      IncrementalJoinOps.appendToJoinView(
        Seq((1L, s"x$i")).toDF("k", "av"), b0.filter(lit(false)),
        spark, base, "k", 4)
    }
    IncrementalJoinOps.compactJoinView(spark, base, maxFilesPerBucket = 1)
    val committed = IncrementalJoinOps.readJoinView(spark, base)
      .collect().map(_.toSeq).toSet
    // crash mid-NEXT-swap: a torn manifest version (data, no _SUCCESS)
    // with poison rows naming dirs that don't exist
    val mdir = s"$base/_manifest"
    val tornV = new File(mdir).listFiles()
      .filter(_.getName.startsWith("v=")) 
      .map(_.getName.stripPrefix("v=").toLong).max + 1
    Seq((999L, "j", 999, Option.empty[Long])).toDF("c", "side", "bucket", "tag")
      .coalesce(1).write.parquet(s"$mdir/v=$tornV")
    val marker = new File(s"$mdir/v=$tornV/_SUCCESS")
    assert(marker.exists() && marker.delete(), "fixture: tear the marker")
    assert(IncrementalJoinOps.readJoinView(spark, base)
      .collect().map(_.toSeq).toSet == committed,
      "torn swap must not change the resolved view")
    // a refresh (manifest APPEND) still lands against the live version
    IncrementalJoinOps.appendToJoinView(
      Seq((2L, "a9")).toDF("k", "av"), b0.filter(lit(false)),
      spark, base, "k", 4)
    val after = IncrementalJoinOps.readJoinView(spark, base)
      .collect().map(_.toSeq).toSet
    assert(after.size == committed.size + 1)
    // the next compaction (real swap) commits past the torn id, sweeps it
    IncrementalJoinOps.compactJoinView(spark, base, maxFilesPerBucket = 1)
    assert(IncrementalJoinOps.readJoinView(spark, base)
      .collect().map(_.toSeq).toSet == after)
    assert(!new File(s"$mdir/v=$tornV").exists(),
      "completed swap must retire the torn version dir")
  }
}
