package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.IncrementalAggOps

/** [[AggStoreRewrite]] — registered rollups must transparently serve
  * matching fact-table aggregates (plan-visibly), stay correct under
  * delta maintenance, and NEVER touch a query the store can't provably
  * answer. */
class AggRewriteSpec extends SparkTestBase {

  private def fact = s"$sfTiny/lineitem.parquet"
  private def li = spark.read.parquet(fact)

  private def rawAgg = li
    .groupBy("l_returnflag", "l_linestatus")
    .agg(sum("l_quantity").as("sum_qty"))

  private def resultMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

  /** Root paths of every file relation in the optimized plan (the plan's
    * toString elides paths, so assertions must look at the relations). */
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  test("a registered rollup serves the aggregate without a fact scan") {
    val store = Files.createTempDirectory("aggrw").toString
    AggStoreRegistry.clear() // the registry is session-global: drop any
                             // registrations left by gate queries
    try {
      // 80/20 build + fold: the rewrite must serve the MAINTAINED state
      val prepped = li.select(col("l_orderkey"), col("l_returnflag"),
        col("l_linestatus"), col("l_quantity"))
      IncrementalAggOps.writeAggStore(
        prepped.filter(col("l_orderkey") % 5 =!= 0).drop("l_orderkey"),
        spark, store, Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity"), 8)
      IncrementalAggOps.mergeIntoAggStore(
        prepped.filter(col("l_orderkey") % 5 === 0).drop("l_orderkey"),
        spark, store, Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity"), 8)
      val want = resultMap(rawAgg) // registry empty: the real fact scan

      AggStoreRegistry.register(spark, fact, store,
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
      val served = rawAgg
      val paths = scanPaths(served)
      assert(paths.exists(_.contains(store.split('/').last)),
        s"plan must read the store, scans: $paths")
      assert(!paths.exists(_.contains("lineitem.parquet")),
        s"plan must not scan the fact table, scans: $paths")
      // quantities are integer-valued doubles: sums are exact, order-free
      assert(resultMap(served) == want)
    } finally AggStoreRegistry.clear()
  }

  test("coarser groupings re-aggregate the store for integral measures") {
    val store = Files.createTempDirectory("aggrw3").toString
    try {
      IncrementalAggOps.writeAggStore(
        li.select("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey"),
        spark, store, Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity", "l_orderkey"), 8)
      AggStoreRegistry.register(spark, fact, store,
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_orderkey"))
      // integral measure, subset grouping: served by re-summing partials
      val coarse = li.groupBy("l_returnflag")
        .agg(sum("l_orderkey").as("key_sum"))
      val paths = scanPaths(coarse)
      assert(paths.exists(_.contains(store.split('/').last)) &&
        !paths.exists(_.contains("lineitem.parquet")),
        s"coarse grouping must re-aggregate the store, scans: $paths")
      val got = coarse.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      AggStoreRegistry.clear() // ground truth: the real fact scan
      val want = li.groupBy("l_returnflag")
        .agg(sum("l_orderkey").as("key_sum")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
      // double measure at a coarser grouping: must NOT be re-associated
      AggStoreRegistry.register(spark, fact, store,
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_orderkey"))
      assert(scanPaths(li.groupBy("l_returnflag")
        .agg(sum("l_quantity").as("s")))
        .exists(_.contains("lineitem.parquet")))
    } finally AggStoreRegistry.clear()
  }

  test("count(*) is served from a declared sum-of-ones measure") {
    val store = Files.createTempDirectory("aggrw5").toString
    AggStoreRegistry.clear()
    try {
      IncrementalAggOps.writeAggStore(
        li.select(col("l_returnflag"), col("l_linestatus"),
          lit(1L).as("n_rows")),
        spark, store, Seq("l_returnflag", "l_linestatus"),
        Seq("n_rows"), 8)
      AggStoreRegistry.register(spark, fact, store,
        Seq("l_returnflag", "l_linestatus"), Seq("n_rows"),
        countMeasure = Some("n_rows"))
      // exact key set: pure projection; coarser: re-summed ones
      val exactQ = li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
      val coarseQ = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      Seq(exactQ, coarseQ).foreach { q =>
        assert(scanPaths(q).exists(_.contains(store.split('/').last)) &&
          !scanPaths(q).exists(_.contains("lineitem.parquet")),
          s"count(*) must be store-served: ${scanPaths(q)}")
      }
      val got = coarseQ.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      AggStoreRegistry.clear()
      val want = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally AggStoreRegistry.clear()
  }

  test("min/max measures serve coarser groupings for any type") {
    val store = Files.createTempDirectory("aggrw4").toString
    try {
      IncrementalAggOps.writeAggStore(
        li.select("l_returnflag", "l_linestatus", "l_extendedprice"),
        spark, store, Seq("l_returnflag", "l_linestatus"),
        Seq("l_extendedprice"), 8, kinds = Seq("min"))
      AggStoreRegistry.register(spark, fact, store,
        Seq("l_returnflag", "l_linestatus"), Seq("l_extendedprice"),
        kinds = Seq("min"))
      // min-of-mins is exact even for doubles: coarser grouping served
      val coarse = li.groupBy("l_returnflag")
        .agg(min("l_extendedprice").as("m"))
      assert(scanPaths(coarse).exists(_.contains(store.split('/').last)),
        s"coarse min must re-aggregate the store: ${scanPaths(coarse)}")
      val got = coarse.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      // a SUM over the min-kind measure must NOT be served (wrong monoid)
      assert(scanPaths(li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_extendedprice").as("s")))
        .exists(_.contains("lineitem.parquet")))
      AggStoreRegistry.clear()
      val want = li.groupBy("l_returnflag")
        .agg(min("l_extendedprice").as("m")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == want)
    } finally AggStoreRegistry.clear()
  }

  test("hdr_percentile is served from a maintained HDR rollup") {
    import graft.expressions.HdrPercentile.hdrPercentile
    val dirp = Files.createTempDirectory("aggrwh")
    val prep = s"$dirp/events_cents.parquet"
    val store = s"$dirp/store"
    AggStoreRegistry.clear()
    try {
      spark.read.parquet(s"$sfTiny/events.parquet")
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .write.parquet(prep)
      val ev = spark.read.parquet(prep)
      // 80/20 build + fold: serving must reflect the MAINTAINED state
      IncrementalAggOps.writeHdrStore(ev.filter(col("cents") % 5 =!= 0),
        spark, store, Seq("event_type"), "cents", nBuckets = 8)
      IncrementalAggOps.mergeIntoHdrStore(ev.filter(col("cents") % 5 === 0),
        spark, store, Seq("event_type"), "cents", nBuckets = 8)
      def q() = ev.groupBy("event_type").agg(
        hdrPercentile(col("cents"), 0.5).as("p50_b"),
        hdrPercentile(col("cents"), 0.99).as("p99_b"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = rows(q()) // registry empty: the direct fact-scan path

      AggStoreRegistry.register(spark, prep, store,
        Seq("event_type"), Seq("cents"), kinds = Seq("hdr"))
      val served = q()
      val paths = scanPaths(served)
      assert(paths.exists(_.contains("store")) &&
        !paths.exists(_.contains("events_cents.parquet")),
        s"hdr aggregate must be store-served, scans: $paths")
      assert(rows(served) == want,
        "served percentiles must equal the direct computation")
      // and both agree with the SketchOps bucket-table walk
      val walk = graft.ops.SketchOps
        .hdrQuantiles(ev, col("event_type"), col("cents")).collect()
        .map(r => r.getString(0) ->
          (r.getLong(r.fieldIndex("p50_b")), r.getLong(r.fieldIndex("p99_b"))))
        .toMap
      assert(walk == want)

      // COUNT(*) rides the same store: per-key fact rows = Σ bucket counts
      val cnt = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(scanPaths(cnt).exists(_.contains("store")) &&
        !scanPaths(cnt).exists(_.contains("events_cents.parquet")),
        s"count(*) must be hdr-store-served: ${scanPaths(cnt)}")
      val gotCnt = cnt.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val wantCnt = {
        AggStoreRegistry.clear()
        val m = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        AggStoreRegistry.register(spark, prep, store,
          Seq("event_type"), Seq("cents"), kinds = Seq("hdr"))
        m
      }
      assert(gotCnt == wantCnt)

      // a different subBits answers a different bucketing: not served
      val otherSb = ev.groupBy("event_type")
        .agg(hdrPercentile(col("cents"), 0.5, subBits = 4).as("p"))
      assert(scanPaths(otherSb).exists(_.contains("events_cents.parquet")),
        s"subBits mismatch must fall back: ${scanPaths(otherSb)}")
      // a sum over the hdr measure is the wrong monoid: not served
      val sumQ = ev.groupBy("event_type").agg(sum("cents").as("s"))
      assert(scanPaths(sumQ).exists(_.contains("events_cents.parquet")))
    } finally AggStoreRegistry.clear()
  }

  test("hdr rollup serves COARSER key subsets: (bucket, count) rows fold " +
    "across keys losslessly") {
    import graft.expressions.HdrPercentile.hdrPercentile
    val dirp = Files.createTempDirectory("aggrwhc")
    val prep = s"$dirp/ev2.parquet"
    val store = s"$dirp/store"
    AggStoreRegistry.clear()
    try {
      spark.read.parquet(s"$sfTiny/events.parquet")
        .select(col("event_type"),
          (col("event_id") % 7).as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .write.parquet(prep)
      val ev = spark.read.parquet(prep)
      // the store is maintained at the FINER (event_type, day) grain
      IncrementalAggOps.writeHdrStore(ev.filter(col("cents") % 5 =!= 0),
        spark, store, Seq("event_type", "day"), "cents", nBuckets = 8)
      IncrementalAggOps.mergeIntoHdrStore(ev.filter(col("cents") % 5 === 0),
        spark, store, Seq("event_type", "day"), "cents", nBuckets = 8)
      AggStoreRegistry.register(spark, prep, store,
        Seq("event_type", "day"), Seq("cents"), kinds = Seq("hdr"))

      // coarser grouping (event_type only): served by re-folding the
      // store's (bucket, count) rows across days — exact, because the
      // bucket function is idempotent on its lower bounds and counts sum
      def q() = ev.groupBy("event_type").agg(
        hdrPercentile(col("cents"), 0.5).as("p50_b"),
        hdrPercentile(col("cents"), 0.99).as("p99_b"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val served = q()
      assert(scanPaths(served).exists(_.contains("store")) &&
        !scanPaths(served).exists(_.contains("ev2.parquet")),
        s"coarser hdr rollup must be store-served: ${scanPaths(served)}")
      val want = {
        AggStoreRegistry.clear()
        val m = rows(q())
        AggStoreRegistry.register(spark, prep, store,
          Seq("event_type", "day"), Seq("cents"), kinds = Seq("hdr"))
        m
      }
      assert(rows(served) == want,
        "coarser-served percentiles must equal the direct computation")

      // the exact 2-key grain serves too (one more re-agg, same rows)
      def q2() = ev.groupBy("event_type", "day")
        .agg(hdrPercentile(col("cents"), 0.9).as("p90_b"))
      val served2 = q2()
      assert(scanPaths(served2).exists(_.contains("store")) &&
        !scanPaths(served2).exists(_.contains("ev2.parquet")))
      val got2 = served2.collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want2 = {
        AggStoreRegistry.clear()
        val m = q2().collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        AggStoreRegistry.register(spark, prep, store,
          Seq("event_type", "day"), Seq("cents"), kinds = Seq("hdr"))
        m
      }
      assert(got2 == want2)

      // COUNT(*) at the coarser grain rides the same store
      val cnt = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(scanPaths(cnt).exists(_.contains("store")) &&
        !scanPaths(cnt).exists(_.contains("ev2.parquet")),
        s"coarser count(*) must be hdr-store-served: ${scanPaths(cnt)}")
      val gotCnt = cnt.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val wantCnt = {
        AggStoreRegistry.clear()
        val m = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        AggStoreRegistry.register(spark, prep, store,
          Seq("event_type", "day"), Seq("cents"), kinds = Seq("hdr"))
        m
      }
      assert(gotCnt == wantCnt)

      // a grouping OUTSIDE the key set must fall back to the fact scan
      val outside = ev.groupBy("cents")
        .agg(hdrPercentile(col("cents"), 0.5).as("p"))
      assert(scanPaths(outside).exists(_.contains("ev2.parquet")))
    } finally AggStoreRegistry.clear()
  }

  test("hdr_percentile SQL form matches the Column form; retraction " +
    "restores the maintained store exactly") {
    import graft.expressions.HdrPercentile.hdrPercentile
    val dirp = Files.createTempDirectory("aggrwhr")
    val prep = s"$dirp/ev.parquet"
    val store = s"$dirp/store"
    AggStoreRegistry.clear()
    try {
      spark.read.parquet(s"$sfTiny/events.parquet")
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .write.parquet(prep)
      val ev = spark.read.parquet(prep)
      // SQL-registry form (GraftExtensions injectFunction) ≡ Column form
      ev.createOrReplaceTempView("hdr_ev")
      val viaSql = spark.sql(
        """SELECT event_type, hdr_percentile(cents, 0.9) AS p
          |FROM hdr_ev GROUP BY event_type""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val viaCol = ev.groupBy("event_type")
        .agg(hdrPercentile(col("cents"), 0.9).as("p"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaSql == viaCol && viaSql.nonEmpty)

      // merge a batch, retract it: the quantile walk over the store must
      // equal the pre-merge state (counts are sums — deletion is exact)
      val batch = ev.filter(col("cents") % 7 === 0)
      IncrementalAggOps.writeHdrStore(ev, spark, store,
        Seq("event_type"), "cents", nBuckets = 8)
      def walk() = graft.ops.SketchOps.hdrQuantilesFromTable(
          IncrementalAggOps.readAggStore(spark, store)
            .select(col("event_type").as("g"), col(IncrementalAggOps.HdrBucketCol).as("b"),
              col(IncrementalAggOps.HdrCountCol).as("n")))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val before = walk()
      IncrementalAggOps.mergeIntoHdrStore(batch, spark, store,
        Seq("event_type"), "cents", nBuckets = 8)
      assert(walk() != before, "the merge must be visible before retraction")
      IncrementalAggOps.retractFromHdrStore(batch, spark, store,
        Seq("event_type"), "cents", nBuckets = 8)
      assert(walk() == before,
        "retracting the merged batch must restore the sketch exactly")
    } finally AggStoreRegistry.clear()
  }

  test("hll is NOT a servable kind: union≠one-shot divergence pinned, " +
    "registration rejected") {
    val dirp = Files.createTempDirectory("aggrwhll")
    val prep = s"$dirp/li_keys.parquet"
    val store = s"$dirp/store"
    AggStoreRegistry.clear()
    try {
      li.select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"))
        .write.parquet(prep)
      val ev = spark.read.parquet(prep)
      // Why the rule has no hll branch: union of per-batch register
      // blobs yields a VALID estimate but not the SAME estimate as the
      // one-shot sketch over the fact (DataSketches promotes coupon→
      // dense along a different path under union). Pin a concrete
      // divergence at this cardinality (~700/cell, lgK=12) — if the
      // library ever makes these equal, this assert flags that a
      // serving branch would become possible again.
      graft.ops.SketchOps.writeHllStore(
        ev.filter(col("l_orderkey") % 5 =!= 0), store,
        Seq("l_returnflag", "l_linestatus"), col("l_orderkey"), lgK = 12)
      graft.ops.SketchOps.writeHllStore(
        ev.filter(col("l_orderkey") % 5 === 0), store,
        Seq("l_returnflag", "l_linestatus"), col("l_orderkey"), lgK = 12,
        append = true)
      val unioned = graft.ops.SketchOps
        .readHllStore(spark, store, Seq("l_returnflag", "l_linestatus"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val oneShot = ev.groupBy("l_returnflag", "l_linestatus")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"), lit(12)))
          .as("nd"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(unioned.keySet == oneShot.keySet && unioned.nonEmpty)
      // both are sound estimates (within HLL error of each other)…
      unioned.foreach { case (k, u) =>
        assert(math.abs(u - oneShot(k)) <= 0.05 * oneShot(k), s"$k: $u vs ${oneShot(k)}")
      }
      // …but NOT identical — which is exactly why serving is refused
      assert(unioned != oneShot,
        "union and one-shot estimates now agree exactly — an hll " +
          "serving branch may be safe to (re)introduce; see AggStoreRegistry doc")

      // and the registry refuses the kind outright
      val err = intercept[IllegalArgumentException] {
        AggStoreRegistry.register(spark, prep, store,
          Seq("l_returnflag", "l_linestatus"), Seq("l_orderkey"),
          kinds = Seq("hll"))
      }
      assert(err.getMessage.contains("hll"))
    } finally AggStoreRegistry.clear()
  }

  test("non-answerable shapes are left untouched") {
    val store = Files.createTempDirectory("aggrw2").toString
    try {
      IncrementalAggOps.writeAggStore(
        li.select("l_returnflag", "l_linestatus", "l_quantity"),
        spark, store, Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity"), 8)
      AggStoreRegistry.register(spark, fact, store,
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
      def factScanned(df: org.apache.spark.sql.DataFrame): Boolean =
        scanPaths(df).exists(_.contains("lineitem.parquet"))
      // a filter on a NON-KEY column between scan and aggregate splits
      // groups: the store can't answer
      assert(factScanned(li.filter(col("l_quantity") > 10)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("s"))))
      // but a filter on KEY columns commutes with the rollup: served,
      // with the predicate replayed against the store
      val keyFiltered = li.filter(col("l_returnflag") =!= "N")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("s"))
      assert(!factScanned(keyFiltered),
        s"key-only filters must be served: ${scanPaths(keyFiltered)}")
      val gotKf = keyFiltered.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(gotKf.keySet.forall(_._1 != "N") && gotKf.nonEmpty)
      val wantKf = {
        AggStoreRegistry.clear()
        val m = li.filter(col("l_returnflag") =!= "N")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("s")).collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
        AggStoreRegistry.register(spark, fact, store,
          Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"))
        m
      }
      assert(gotKf == wantKf)
      // sum over an expression, not a bare measure column
      assert(factScanned(li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity") * 2).as("s"))))
      // coarser grouping than the store's key set
      assert(factScanned(li.groupBy("l_returnflag")
        .agg(sum("l_quantity").as("s"))))
      // an aggregate the store does not carry
      assert(factScanned(li.groupBy("l_returnflag", "l_linestatus")
        .agg(max("l_quantity").as("s"))))
      // a different fact table entirely
      assert(scanPaths(spark.read.parquet(s"$sfTiny/orders.parquet")
        .groupBy("o_orderpriority").agg(sum("o_totalprice").as("s")))
        .exists(_.contains("orders.parquet")))
    } finally AggStoreRegistry.clear()
  }

  test("fuzz: with rollups registered, EVERY generated query shape returns " +
    "results bit-identical to the unregistered plan") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // The rule is load-bearing for four measure kinds; a false match is
    // a silent-wrong-answer bug class. The contract under fuzz is
    // result-IDENTITY, which needs no servability oracle: whatever the
    // rule decides for a shape (serve or fall back), collected rows must
    // equal the unregistered plan's bit-for-bit. qty columns are
    // integral-valued (sums exact in double), so equality is exact even
    // for float measures.
    val dirp = Files.createTempDirectory("aggrwfuzz")
    val prep = s"$dirp/fact.parquet"
    val sumStore = s"$dirp/sumstore"
    val mmStore = s"$dirp/mmstore"
    val hdrStore = s"$dirp/hdrstore"
    AggStoreRegistry.clear()
    try {
      li.select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty_l"),
          col("l_quantity").cast("long").cast("double").as("qty_d"),
          lit(1L).as("ones"), col("l_orderkey").as("pk"))
        .write.parquet(prep)
      val fact = spark.read.parquet(prep)
      fact.createOrReplaceTempView("fuzz_fact")
      val keys = Seq("l_returnflag", "l_linestatus")
      IncrementalAggOps.writeAggStore(fact, spark, sumStore, keys,
        Seq("qty_l", "qty_d", "ones"), 8)
      IncrementalAggOps.writeAggStore(fact, spark, mmStore, keys,
        Seq("qty_l", "qty_d"), 8, kinds = Seq("min", "max"))
      IncrementalAggOps.writeHdrStore(fact, spark, hdrStore, keys,
        "qty_l", nBuckets = 8)
      def registerAll(): Unit = {
        AggStoreRegistry.register(spark, prep, sumStore, keys,
          Seq("qty_l", "qty_d", "ones"), countMeasure = Some("ones"))
        AggStoreRegistry.register(spark, prep, mmStore, keys,
          Seq("qty_l", "qty_d"), kinds = Seq("min", "max"))
        AggStoreRegistry.register(spark, prep, hdrStore, keys,
          Seq("qty_l"), kinds = Seq("hdr"))
      }

      // (select-list fragment, group-by fragment) — includes non-key
      // groupings and a non-attribute grouping expression
      val groupGen: Gen[(Seq[String], Seq[String])] = Gen.oneOf(
        (Seq("l_returnflag"), Seq("l_returnflag")),
        (Seq("l_linestatus"), Seq("l_linestatus")),
        (Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag", "l_linestatus")),
        (Seq("l_returnflag", "qty_l"), Seq("l_returnflag", "qty_l")),
        (Seq("qty_l"), Seq("qty_l")),
        (Seq("upper(l_returnflag) AS gx"), Seq("upper(l_returnflag)")))
      // servable shapes, near-miss traps (COUNT(col), DISTINCT, FILTER,
      // expressions, wrong kind, wrong subBits, unregistered measure)
      val aggGen: Gen[String] = Gen.oneOf(Seq(
        "SUM(qty_l)", "SUM(qty_d)", "MIN(qty_l)", "MAX(qty_d)",
        "MAX(qty_l)", "MIN(qty_d)", "COUNT(*)", "COUNT(qty_l)",
        "SUM(DISTINCT qty_l)", "SUM(qty_l) FILTER (WHERE pk % 2 = 0)",
        "SUM(qty_l + 1)", "hdr_percentile(qty_l, 0.9)",
        "hdr_percentile(qty_l, 0.9, 4)", "SUM(pk)"))
      val whereGen: Gen[String] = Gen.oneOf("",
        "WHERE l_returnflag = 'A'", "WHERE l_linestatus IN ('F', 'O')",
        "WHERE qty_l > 25", "WHERE pk % 3 = 0",
        "WHERE l_returnflag = 'A' AND qty_l > 10")
      val joinGen: Gen[Boolean] = Gen.frequency(3 -> false, 1 -> true)
      val freeForAll = for {
        (sel, grp) <- groupGen
        n <- Gen.choose(1, 3)
        as <- Gen.listOfN(n, aggGen)
        w <- whereGen
        j <- joinGen
      } yield (sel, grp, as, w, j)
      // a trap-free branch: one registration's family, key-only
      // groupings and filters, no join — without it nearly every random
      // draw carries SOME disqualifier and the serving path goes
      // unexercised (a vacuous property)
      val keyGroupGen = Gen.oneOf(
        Seq("l_returnflag"), Seq("l_linestatus"),
        Seq("l_returnflag", "l_linestatus"))
      val familyGen: Gen[Seq[String]] = Gen.oneOf(
        Seq("SUM(qty_l)", "SUM(qty_d)", "COUNT(*)"),
        Seq("MIN(qty_l)", "MAX(qty_d)"),
        Seq("hdr_percentile(qty_l, 0.9)", "COUNT(*)"))
      val likelyServable = for {
        g <- keyGroupGen
        fam <- familyGen
        n <- Gen.choose(1, 2)
        as <- Gen.listOfN(n, Gen.oneOf(fam))
        w <- Gen.oneOf("", "WHERE l_returnflag = 'A'",
          "WHERE l_linestatus IN ('F', 'O')")
      } yield (g, g, as, w, false)
      val shapeGen = Gen.frequency(2 -> freeForAll, 1 -> likelyServable)

      var served = 0
      var fellBack = 0
      (0 until 60).foreach { i =>
        val (sel, grp, as, w, j) =
          shapeGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
        val aggSql = as.zipWithIndex.map { case (a, k) => s"$a AS a$k" }
        val from =
          if (j) "fuzz_fact f JOIN (SELECT DISTINCT l_returnflag AS r " +
            "FROM fuzz_fact) d ON f.l_returnflag = d.r"
          else "fuzz_fact"
        val sql = s"SELECT ${(sel ++ aggSql).mkString(", ")} FROM $from " +
          s"$w GROUP BY ${grp.mkString(", ")}"
        AggStoreRegistry.clear()
        registerAll()
        val withStores = spark.sql(sql)
        val paths = scanPaths(withStores)
        if (paths.exists(p => p.contains("sumstore") || p.contains("mmstore")
            || p.contains("hdrstore"))) served += 1
        else fellBack += 1
        val got = withStores.collect().map(_.toString).sorted.toSeq
        AggStoreRegistry.clear()
        val want = spark.sql(sql).collect().map(_.toString).sorted.toSeq
        assert(got == want,
          s"shape #$i changed results under the rewrite:\n$sql\nscans: $paths")
      }
      // the fuzz must actually exercise BOTH paths, or the property is
      // vacuous — thresholds well under the observed split
      assert(served >= 6, s"too few shapes store-served: $served")
      assert(fellBack >= 6, s"too few shapes fell back: $fellBack")

      // non-deterministic predicates: results can't be compared across
      // runs, but the plan must provably NOT be rewritten (rand()
      // references no column, vacuously passing a keys-only check).
      // The probability must be non-vacuous — `rand() < 2` is folded to
      // TRUE by the main optimizer before this rule ever sees it, and
      // serving the then-filterless aggregate is correct.
      AggStoreRegistry.clear()
      registerAll()
      val nd = spark.sql(
        "SELECT l_returnflag, SUM(qty_l) AS s FROM fuzz_fact " +
          "WHERE rand(7) < 0.5 GROUP BY l_returnflag")
      assert(scanPaths(nd).exists(_.contains("fact.parquet")),
        s"non-deterministic filter must not be served: ${scanPaths(nd)}")
    } finally AggStoreRegistry.clear()
  }
}
