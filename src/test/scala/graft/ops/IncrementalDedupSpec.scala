package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental dedup = the store×delta restriction of the batch operator,
  * computed without ever shuffling the store. Both halves are pinned here:
  * value-level equivalence against [[DedupOps.minhashPairs]] over the
  * union, and the Exchange-free bucketed store side of the candidate
  * join. */
class IncrementalDedupSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfSmall/documents.parquet")
  private lazy val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
  private lazy val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)

  private lazy val storeTables: (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("inc-dedup").toString
    DedupOps.writeFingerprintStore(store, spark,
      "inc_spec_bands", "inc_spec_sets", base)
    ("inc_spec_bands", "inc_spec_sets")
  }

  test("incremental pairs equal the cross-split slice of the batch operator") {
    val (bands, sets) = storeTables
    val inc = DedupOps.incrementalPairs(delta, spark, bands, sets)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap

    val deltaIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = DedupOps.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .filter { case (a, b, _, _) => deltaIds.contains(a) ^ deltaIds.contains(b) }
      .map { case (a, b, est, j) =>
        (if (deltaIds.contains(a)) (b, a) else (a, b)) -> (est, j)
      }.toMap

    assert(inc.keySet == full.keySet,
      s"pair sets differ: only-inc=${inc.keySet -- full.keySet} " +
        s"only-batch=${full.keySet -- inc.keySet}")
    full.foreach { case (k, (est, j)) =>
      val (ie, ij) = inc(k)
      assert(ie == est && ij == j, s"pair $k: ($ie,$ij) vs ($est,$j)")
    }
    assert(inc.nonEmpty, "fixture produced no cross-split near-dups")
  }

  test("tombstoned ids never pair; everything else is untouched") {
    // a FRESH store (the shared one must stay unmutated for the other
    // tests): seed, find the pairing id_olds, tombstone half of them
    val base = java.nio.file.Files.createTempDirectory("inc-del").toString
    DedupOps.writeFingerprintStore(store, spark,
      "inc_del_bands", "inc_del_sets", base)
    val before = DedupOps.incrementalPairs(delta, spark,
      "inc_del_bands", "inc_del_sets")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.nonEmpty, "fixture produced no pairs to delete against")
    val olds = before.map(_._1).toSeq.sorted
    val dead = olds.take((olds.size + 1) / 2).toSet
    import spark.implicits._
    DedupOps.deleteFromFingerprintStore(
      dead.toSeq.toDF("doc_id"), spark, "inc_del_sets")
    val after = DedupOps.incrementalPairs(delta, spark,
      "inc_del_bands", "inc_del_sets")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before.filterNot { case (o, _) => dead(o) },
      s"delete must drop exactly the tombstoned id_olds: " +
        s"extra=${after -- before} missing=${before.filterNot {
          case (o, _) => dead(o) } -- after}")
    // deletion is permanent: the ingest replay guard treats the id as
    // seen, so re-ingesting under a tombstoned id appends nothing and
    // the id still pairs with nothing
    val deadDocs = docs.join(dead.toSeq.toDF("doc_id"), Seq("doc_id"),
      "left_semi")
    graft.streaming.IngestOps.ingestBatch(deadDocs, spark,
      "inc_del_bands", "inc_del_sets").collect()
    val again = DedupOps.incrementalPairs(delta, spark,
      "inc_del_bands", "inc_del_sets")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == after, "a burned id must stay deleted through ingest")
  }

  test("rebuild reclaims deleted fingerprints, carries tombstones, and " +
    "keeps burned ids burned through a replayed ingest") {
    val base = java.nio.file.Files.createTempDirectory("inc-rb").toString
    DedupOps.writeFingerprintStore(store, spark,
      "inc_rb_bands", "inc_rb_sets", base)
    val before = DedupOps.incrementalPairs(delta, spark,
      "inc_rb_bands", "inc_rb_sets")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.nonEmpty, "fixture produced no pairs to delete against")
    val dead = before.map(_._1).toSeq.sorted
      .take((before.size + 1) / 2).toSet
    import spark.implicits._
    DedupOps.deleteFromFingerprintStore(
      dead.toSeq.toDF("doc_id"), spark, "inc_rb_sets")
    val expected = before.filterNot { case (o, _) => dead(o) }

    DedupOps.rebuildFingerprintStore(spark, "inc_rb_bands", "inc_rb_sets",
      java.nio.file.Files.createTempDirectory("inc-rb-new").toString)

    // (a) the deleted docs' fingerprints are PHYSICALLY gone: no band
    // rows, no live set rows — only the carried-forward tombstones
    val deadDf = dead.toSeq.toDF("id")
    assert(spark.table("inc_rb_bands")
      .join(deadDf, Seq("id"), "left_semi").count() == 0,
      "rebuild must drop deleted ids' band rows")
    val deadSets = spark.table("inc_rb_sets")
      .join(deadDf, Seq("id"), "left_semi")
    assert(deadSets.filter(col("ss").isNotNull).count() == 0,
      "rebuild must drop deleted ids' live set rows")
    assert(deadSets.filter(col("ss").isNull).select("id").distinct().count()
      == dead.size,
      "rebuild must carry every tombstone forward")

    // semantics preserved: the delta dedups identically post-rebuild
    val after = DedupOps.incrementalPairs(delta, spark,
      "inc_rb_bands", "inc_rb_sets")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == expected, s"rebuild changed pair semantics: " +
      s"extra=${after -- expected} missing=${expected -- after}")

    // (b) burned ids stay burned: a replayed batch carrying deleted docs
    // appends nothing (the replay guard sees the tombstone ids) and
    // still produces no pairs against them
    val deadDocs = docs.join(dead.toSeq.toDF("doc_id"), Seq("doc_id"),
      "left_semi")
    graft.streaming.IngestOps.ingestBatch(deadDocs, spark,
      "inc_rb_bands", "inc_rb_sets").collect()
    assert(spark.table("inc_rb_sets")
      .join(deadDf, Seq("id"), "left_semi")
      .filter(col("ss").isNotNull).count() == 0,
      "a replayed ingest must not resurrect a deleted doc post-rebuild")
    val again = DedupOps.incrementalPairs(delta, spark,
      "inc_rb_bands", "inc_rb_sets")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == expected)
  }

  test("the candidate join reads the store Exchange-free") {
    val (bands, _) = storeTables
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val saved = Seq(key, aqeKey).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(key, "-1"); spark.conf.set(aqeKey, "-1")
      val dBands = DedupOps.bandFrame(delta)
        .select(col("band"), col("bandHash"), col("id").as("id_new"))
      val j = spark.table(bands)
        .select(col("band"), col("bandHash"), col("id").as("id_old"))
        .join(dBands, Seq("band", "bandHash"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the store scan joins straight out of its bucket layout...
      assert(p.contains("SelectedBucketsCount: 32 out of 32"), p)
      // ...so the ONLY shuffle in the join is the delta side's
      assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
        s"expected exactly the delta-side exchange:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("appended fingerprints join the store: the ingest loop closes") {
    val base = java.nio.file.Files.createTempDirectory("inc-append").toString
    val first = docs.filter(pmod(col("doc_id"), lit(5)).isin(1, 2))
    val second = docs.filter(pmod(col("doc_id"), lit(5)).isin(3, 4))
    DedupOps.writeFingerprintStore(first, spark,
      "inc_app_bands", "inc_app_sets", base)
    DedupOps.appendToFingerprintStore(second, spark,
      "inc_app_bands", "inc_app_sets")

    val inc = DedupOps.incrementalPairs(delta, spark,
      "inc_app_bands", "inc_app_sets")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap

    // equivalence vs the batch operator over the grown store
    val deltaIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    val full = DedupOps.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .filter { case (a, b, _, _) => deltaIds.contains(a) ^ deltaIds.contains(b) }
      .map { case (a, b, est, j) =>
        (if (deltaIds.contains(a)) (b, a) else (a, b)) -> (est, j)
      }.toMap
    assert(inc == full, s"only-inc=${inc.keySet -- full.keySet} " +
      s"only-batch=${full.keySet -- inc.keySet}")
    // the appended half actually contributes matches
    val appendedIds = second.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(inc.keys.exists(k => appendedIds.contains(k._1)),
      "no pair against an appended doc — append did not take effect")
    spark.sql("DROP TABLE IF EXISTS inc_app_bands")
    spark.sql("DROP TABLE IF EXISTS inc_app_sets")
  }

  test("re-ingesting a stored doc never pairs it with itself") {
    val (bands, sets) = storeTables
    val reIngest = store.limit(3)
    val pairs = DedupOps.incrementalPairs(reIngest, spark, bands, sets)
      .filter(col("id_old") === col("id_new")).count()
    assert(pairs == 0L)
  }
}
