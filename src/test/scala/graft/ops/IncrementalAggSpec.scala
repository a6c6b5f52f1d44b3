package graft.ops

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[IncrementalAggOps]] — the gate (agg_store_inc) hash-compares the
  * folded store against DuckDB's one-shot GROUP BY; this spec pins the
  * maintenance mechanics the oracle can't see: partial re-summing for
  * keys present on both sides, and the locality claim — a merge leaves
  * every unaffected bucket's files byte-for-byte untouched. */
class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  /** `(version dir, bucket dir) -> parquet files` over the versioned
    * copy-on-write layout. */
  private def bucketFiles(base: String): Map[(String, String), Map[String, Long]] =
    new File(base).listFiles().filter(_.getName.startsWith("v="))
      .flatMap { v =>
        v.listFiles().filter(_.getName.startsWith("__bucket=")).map { d =>
          (v.getName, d.getName) ->
            d.listFiles().filter(_.getName.endsWith(".parquet"))
              .map(f => f.getName -> f.lastModified()).toMap
        }
      }.toMap

  test("merge re-sums partials for keys on both sides") {
    val base = Files.createTempDirectory("aggstore-sum").toString
    val store = Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("k", "n", "v")
    val delta = Seq((2L, 1L, 5L), (3L, 1L, 7L)).toDF("k", "n", "v")
    IncrementalAggOps.writeAggStore(store, spark, base, Seq("k"), Seq("n", "v"), 8)
    IncrementalAggOps.mergeIntoAggStore(delta, spark, base, Seq("k"), Seq("n", "v"), 8)
    val got = IncrementalAggOps.readAggStore(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 10L), (2L, 2L, 25L), (3L, 1L, 7L)))
  }

  test("retract undoes a merge value-for-value") {
    val base = Files.createTempDirectory("aggstore-retract").toString
    val store = Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("k", "n", "v")
    val batch = Seq((2L, 1L, 5L), (3L, 1L, 7L)).toDF("k", "n", "v")
    IncrementalAggOps.writeAggStore(store, spark, base, Seq("k"), Seq("n", "v"), 8)
    val orig = IncrementalAggOps.readAggStore(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    IncrementalAggOps.mergeIntoAggStore(batch, spark, base, Seq("k"), Seq("n", "v"), 8)
    IncrementalAggOps.retractFromAggStore(batch, spark, base, Seq("k"), Seq("n", "v"), 8)
    val back = IncrementalAggOps.readAggStore(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // key 3 existed only in the batch: it remains as an explicit zero row
    assert(back == orig + ((3L, 0L, 0L)),
      s"retraction must invert the merge: $back vs $orig")
  }

  test("cms store: incremental equals one-shot exactly; retract inverts; " +
    "grouped estimates stay group-local") {
    val df = spark.range(0, 3000)
      .select((col("id") % 7).cast("string").as("g"),
        (col("id") % 41).as("k")) // 41 keys, skewed across 7 groups
    val b1 = df.filter(col("k") % 3 =!= 0)
    val b2 = df.filter(col("k") % 3 === 0)
    val (d, w) = (4, 512)
    val inc = Files.createTempDirectory("cms-inc").toString
    val one = Files.createTempDirectory("cms-one").toString
    IncrementalAggOps.writeCmsStore(b1, spark, inc, Seq("g"), "k", d, w, 8)
    IncrementalAggOps.mergeIntoCmsStore(b2, spark, inc, Seq("g"), "k", d, w, 8)
    IncrementalAggOps.writeCmsStore(df, spark, one, Seq("g"), "k", d, w, 8)
    def estAll(base: String) = IncrementalAggOps
      .cmsEstimateFromStore(df, spark, base, Seq("g"), "k", d, w)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ei = estAll(inc)
    val eo = estAll(one)
    assert(ei == eo, "incremental CMS must equal the one-shot sketch exactly")
    // the estimates obey the CMS contract vs per-group exact counts
    val exact = df.groupBy("g", "k").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(exact.forall { case (key, n) => ei(key) >= n },
      "CMS never undercounts")
    // retraction inverts the merge: back to the b1-only estimates
    val ref = Files.createTempDirectory("cms-ref").toString
    IncrementalAggOps.writeCmsStore(b1, spark, ref, Seq("g"), "k", d, w, 8)
    IncrementalAggOps.retractFromCmsStore(b2, spark, inc, Seq("g"), "k", d, w, 8)
    assert(estAll(inc) == estAll(ref),
      "retract must return the sketch to its pre-merge state")
    // an unseen key in an existing group estimates near zero (bounded by
    // collision mass), never borrows another group's counters
    val probe = Seq(("0", 999L)).toDF("g", "k")
    val unseen = IncrementalAggOps
      .cmsEstimateFromStore(probe, spark, one, Seq("g"), "k", d, w)
      .head().getLong(2)
    val g0 = df.filter(col("g") === "0").count()
    assert(unseen <= math.ceil(g0 * math.E / w).toLong,
      s"unseen-key estimate $unseen exceeds the collision bound")
  }

  test("a merge writes only the delta's buckets — as a new version; " +
    "every existing file stays byte-untouched; vacuum reclaims the " +
    "superseded copy") {
    val base = Files.createTempDirectory("aggstore-loc").toString
    val orders = graft.queries.t(spark, sfTiny, "orders")
      .select(col("o_custkey").as("k"), lit(1L).as("n"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
    IncrementalAggOps.writeAggStore(orders, spark, base, Seq("k"), Seq("n", "v"), 8)
    val before = bucketFiles(base)
    assert(before.size == 8 && before.keySet.forall(_._1 == "v=0"),
      s"expected 8 v=0 bucket dirs: ${before.keySet}")
    // a delta of ONE key → exactly one bucket affected
    val delta = Seq((7L, 1L, 100L)).toDF("k", "n", "v")
    IncrementalAggOps.mergeIntoAggStore(delta, spark, base, Seq("k"), Seq("n", "v"), 8)
    val after = bucketFiles(base)
    val touched = "__bucket=" + spark.range(1)
      .select(pmod(hash(lit(7L)), lit(8))).head().getInt(0)
    // copy-on-write: the merge ADDED one version dir for the touched
    // bucket and touched nothing that existed
    assert(after.keySet == before.keySet + (("v=1", touched)),
      s"merge must add exactly v=1/$touched: ${after.keySet -- before.keySet}")
    before.keySet.foreach { b =>
      assert(after(b) == before(b),
        s"existing files of $b were rewritten: ${before(b)} -> ${after(b)}")
    }
    // and the fold landed (resolution picks v=1 for the touched bucket)
    val row = IncrementalAggOps.readAggStore(spark, base)
      .filter(col("k") === 7L).collect().head
    val want = orders.filter(col("k") === 7L)
      .agg(sum("n"), sum("v")).collect().head
    assert(row.getLong(1) == want.getLong(0) + 1L)
    assert(row.getLong(2) == want.getLong(1) + 100L)
    // vacuum deletes exactly the superseded v=0 copy of the touched
    // bucket; the store reads identically after
    val readBefore = IncrementalAggOps.readAggStore(spark, base)
      .collect().map(_.toSeq).toSet
    IncrementalAggOps.vacuumAggStore(spark, base)
    val afterVac = bucketFiles(base)
    assert(afterVac.keySet == after.keySet - (("v=0", touched)),
      s"vacuum must reclaim v=0/$touched only: ${afterVac.keySet}")
    assert(IncrementalAggOps.readAggStore(spark, base)
      .collect().map(_.toSeq).toSet == readBefore)
  }

  test("time travel: read-at-v equals the store as of that merge; the " +
    "version diff names exactly the moved keys; vacuum respects the " +
    "retention floor and reclaimed reads fail loudly") {
    val base = Files.createTempDirectory("aggstore-tt").toString
    val orders = graft.queries.t(spark, sfTiny, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("k"), lit(1L).as("n"),
        round(col("o_totalprice") * 100).cast("long").as("v"))
    val seed = orders.filter(col("o_orderkey") % 3 === 0).drop("o_orderkey")
    val d1 = orders.filter(col("o_orderkey") % 3 === 1).drop("o_orderkey")
    val d2 = orders.filter(col("o_orderkey") % 3 === 2).drop("o_orderkey")
    IncrementalAggOps.writeAggStore(seed, spark, base, Seq("k"), Seq("n", "v"), 8)
    IncrementalAggOps.mergeIntoAggStore(d1, spark, base, Seq("k"), Seq("n", "v"), 8)
    IncrementalAggOps.mergeIntoAggStore(d2, spark, base, Seq("k"), Seq("n", "v"), 8)
    assert(IncrementalAggOps.maxCommittedVersion(spark, base) == 2L)
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy("k")
      .agg(sum("n").as("n"), sum("v").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def readAt(v: Long) = IncrementalAggOps.readAggStoreAt(spark, base, v)
      .select("k", "n", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(readAt(0) == agg(seed), "v0 = the seed rollup")
    assert(readAt(1) == agg(seed.unionByName(d1)), "v1 = seed + delta1")
    assert(readAt(2) == agg(seed.unionByName(d1).unionByName(d2)))
    assert(readAt(2) == IncrementalAggOps.readAggStore(spark, base)
      .select("k", "n", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      "read-at-max = the current read")

    // the version diff names exactly the keys d2 moved
    val diff = IncrementalAggOps.diffAggStore(spark, base,
      Seq("k"), Seq("n", "v"), 1L, 2L)
    val gotKeys = diff.select("k").collect().map(_.getLong(0)).toSet
    val wantKeys = d2.select("k").distinct().collect().map(_.getLong(0)).toSet
    assert(gotKeys == wantKeys,
      s"diff keys must be exactly delta2's: got ${gotKeys.size}, want ${wantKeys.size}")
    // from/to values are the two snapshots' partials (null when absent);
    // columns: k, n_from, v_from, n_to, v_to
    val v1m = readAt(1).map(t => t._1 -> (t._2, t._3)).toMap
    val v2m = readAt(2).map(t => t._1 -> (t._2, t._3)).toMap
    diff.collect().foreach { r =>
      val k = r.getLong(0)
      v1m.get(k) match {
        case Some((n1, vv1)) =>
          assert(r.getLong(1) == n1 && r.getLong(2) == vv1)
        case None => assert(r.isNullAt(1) && r.isNullAt(2))
      }
      val (n2, vv2) = v2m(k) // d2 only adds mass here — always present
      assert(r.getLong(3) == n2 && r.getLong(4) == vv2)
    }

    // retention floor: vacuum(retain=1) keeps v1 and v2 readable,
    // reclaims what only v0 resolves
    IncrementalAggOps.vacuumAggStore(spark, base, retainVersions = 1)
    assert(readAt(1) == agg(seed.unionByName(d1)),
      "retained version must read identically after the vacuum")
    assert(readAt(2) == agg(seed.unionByName(d1).unionByName(d2)))
    // v0: some bucket superseded at v1 lost its v0 copy — loud failure
    val e = intercept[IllegalArgumentException] {
      IncrementalAggOps.readAggStoreAt(spark, base, 0L).collect()
    }
    assert(e.getMessage.contains("predates the vacuum retention"))
    // retain=0 collapses to latest-only; current read unchanged
    IncrementalAggOps.vacuumAggStore(spark, base)
    assert(readAt(2) == agg(seed.unionByName(d1).unionByName(d2)))
    intercept[IllegalArgumentException] {
      IncrementalAggOps.readAggStoreAt(spark, base, 1L).collect()
    }
    // the version diff hits the SAME loud boundary when a side's
    // resolution was reclaimed — never a raw PATH_NOT_FOUND
    val de = intercept[IllegalArgumentException] {
      IncrementalAggOps.diffAggStore(spark, base,
        Seq("k"), Seq("n", "v"), 1L, 2L).collect()
    }
    assert(de.getMessage.contains("predates the vacuum retention"))
  }

  test("streamed folds land exactly once across a checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("aggstore-stream").toString
    val ckpt = s"$base/ckpt"
    IncrementalAggOps.writeAggStore(
      Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("k", "n", "v"),
      spark, base, Seq("k"), Seq("n", "v"), 8)
    val input = MemoryStream[(Long, Long, Long)]
    def start() = IncrementalAggOps.aggStoreSink(
      input.toDS().toDF("k", "n", "v"), base, Seq("k"), Seq("n", "v"), ckpt, 8)
    val q1 = start()
    try { input.addData((2L, 1L, 5L)); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { input.addData((3L, 1L, 7L)); q2.processAllAvailable() }
    finally q2.stop()
    def snap() = IncrementalAggOps.readAggStore(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val after = snap()
    assert(after == Set((1L, 1L, 10L), (2L, 2L, 25L), (3L, 1L, 7L)),
      s"each streamed batch must fold exactly once: $after")
    // a crash-between-fold-and-checkpoint redelivery re-submits an
    // already-committed batch id: must be a no-op
    IncrementalAggOps.mergeIntoAggStore(
      Seq((2L, 1L, 5L)).toDF("k", "n", "v"), spark, base,
      Seq("k"), Seq("n", "v"), 8, batchTag = Some("stream-0"))
    assert(snap() == after, "a redelivered stream batch id must fold nothing")
  }

  test("a tagged merge is replay-idempotent; a torn merge is invisible") {
    val base = Files.createTempDirectory("aggstore-replay").toString
    val store = Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("k", "n", "v")
    val batch = Seq((2L, 1L, 5L), (3L, 1L, 7L)).toDF("k", "n", "v")
    IncrementalAggOps.writeAggStore(store, spark, base, Seq("k"), Seq("n", "v"), 8)
    IncrementalAggOps.mergeIntoAggStore(batch, spark, base,
      Seq("k"), Seq("n", "v"), 8, batchTag = Some("b1"))
    def snap() = IncrementalAggOps.readAggStore(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val committed = snap()
    assert(committed == Set((1L, 1L, 10L), (2L, 2L, 25L), (3L, 1L, 7L)))
    // the at-least-once redelivery: same batch, same tag — must no-op
    // (the in-place-overwrite shape this replaced would double-fold)
    IncrementalAggOps.mergeIntoAggStore(batch, spark, base,
      Seq("k"), Seq("n", "v"), 8, batchTag = Some("b1"))
    assert(snap() == committed, "a redelivered tagged fold must change nothing")
    // a torn merge: data dirs land, the manifest append never does —
    // readers must not see it, and the next writer overwrites the slot
    Seq((9L, 99L, 99L)).toDF("k", "n", "v")
      .withColumn("__bucket", pmod(hash(col("k")), lit(8)))
      .write.mode("overwrite").partitionBy("__bucket")
      .parquet(s"$base/v=2")
    assert(snap() == committed, "uncommitted version dirs must be invisible")
    IncrementalAggOps.mergeIntoAggStore(
      Seq((1L, 1L, 1L)).toDF("k", "n", "v"), spark, base,
      Seq("k"), Seq("n", "v"), 8, batchTag = Some("b2"))
    assert(snap() == Set((1L, 2L, 11L), (2L, 2L, 25L), (3L, 1L, 7L)),
      "the retry slot must overwrite the torn attempt, not absorb it")
  }
}
