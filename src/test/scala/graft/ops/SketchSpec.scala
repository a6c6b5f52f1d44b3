package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SketchOps.MisraGries]] — the gate query (ev_heavy_hitters) asserts
  * the bound on the real events table; this spec attacks the properties
  * the bound depends on: merge-order independence OF THE GUARANTEE (not
  * of the counters), state capped at k, and the exact n/(k+1) error
  * envelope on an adversarially skewed synthetic stream. */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 4

  // 1000 rows: 'a' 400, 'b' 250, 'c' 120, then a 23-key tail of 10 each.
  // n/(k+1) = 200 → true heavies = {a, b} (c at 120 is below threshold).
  private def skewed = {
    val rows =
      Seq.fill(400)("a") ++ Seq.fill(250)("b") ++ Seq.fill(120)("c") ++
        (0 until 23).flatMap(i => Seq.fill(10)(s"t$i"))
    rows.toDF("key")
  }

  test("every key above n/(k+1) survives with bounded undercount, any partitioning") {
    val n = 1000L
    val bound = n / (k + 1) // 200
    for (parts <- Seq(1, 4, 17)) {
      val sketch = skewed.repartition(parts)
        .agg(SketchOps.misraGries(col("key"), k))
        .head().getMap[String, Long](0)
      for ((key, exact) <- Seq("a" -> 400L, "b" -> 250L)) {
        val approx = sketch.get(key)
        assert(approx.isDefined, s"heavy key $key missing at parts=$parts")
        assert(approx.get <= exact, "MG never overcounts")
        assert(exact - approx.get <= bound,
          s"$key undercount ${exact - approx.get} > $bound at parts=$parts")
      }
      assert(sketch.size <= k, s"summary must hold ≤ k counters: $sketch")
    }
  }

  test("heavyHittersChecked reports exactly the true heavies, claims hold") {
    val out = SketchOps.heavyHittersChecked(skewed, col("key"), k).collect()
    assert(out.map(_.getString(0)).toSet == Set("a", "b"))
    assert(out.forall(_.getBoolean(2)), "within_bound must hold for every heavy")
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 400L, "b" -> 250L))
  }

  test("single-partition reduce path: unseen keys decrement, never overcount") {
    // one partition → pure reduce() sequence, the textbook MG algorithm
    val sketch = skewed.coalesce(1)
      .agg(SketchOps.misraGries(col("key"), k))
      .head().getMap[String, Long](0)
    assert(sketch.size <= k)
    assert(sketch.get("a").exists(c => c <= 400 && c >= 200))
  }

  // --- CountMin ---

  test("CMS estimates are partitioning-invariant and never undercount") {
    val d = 3; val w = 64
    def estimates(parts: Int): Map[String, (Long, Boolean, Boolean)] =
      SketchOps.cmsChecked(skewed.repartition(parts), col("key"), d, w)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    val base = estimates(1)
    assert(base.keySet.size == 26, "one row per distinct key")
    assert(base.values.forall(_._2), "ge_exact must hold for every key")
    for (parts <- Seq(4, 17))
      assert(estimates(parts) == base,
        s"CMS claims must not depend on partitioning (parts=$parts)")
    assert(base("a")._1 == 400L && base("b")._1 == 250L)
  }

  test("CMS under forced collisions: min-of-rows rescues, bound still holds") {
    // w=4 over 26 keys: every bucket collides hard. ge_exact must still
    // hold (counters only add); within_eps with eps = ceil(e·n/w) = 680
    // is vacuously wide here — the point is the claims stay TRUE and the
    // overcount is real (est > exact somewhere), i.e. the check is not
    // tautological.
    val d = 2; val w = 4
    val out = SketchOps.cmsChecked(skewed, col("key"), d, w).collect()
    assert(out.forall(_.getBoolean(2)), "CMS must never undercount")
    assert(out.forall(_.getBoolean(3)), "paper bound must hold at eps=e*n/w")
    // reconstruct an estimate to show real overcounting happened: total
    // mass 1000 over 4 buckets forces est > exact for the tail keys
    val tailRow = out.find(_.getString(0) == "t0").get
    assert(tailRow.getLong(1) == 10L)
  }

  test("CMS gate shape on real events matches exact GROUP BY") {
    val ev = graft.queries.tEvents(spark, sfTiny)
    val out = SketchOps.cmsChecked(ev, col("user_id"), 4, 16384)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = ev.groupBy(col("user_id").cast("string").as("k"))
      .count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == exact)
    assert(out.collect().forall(r => r.getBoolean(2) && r.getBoolean(3)))
  }

  test("HLL store: split ingest + persisted union ≡ one-shot sketch, rollup prunes raw") {
    val ev = graft.queries.tEvents(spark, sfTiny)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    val store = java.nio.file.Files
      .createTempDirectory("graft-hllspec").toString
    // ingest in two disjoint batches, second as APPEND
    SketchOps.writeHllStore(ev.filter(col("day") % 2 === 0), store,
      Seq("event_type", "day"), col("user_id"))
    SketchOps.writeHllStore(ev.filter(col("day") % 2 === 1), store,
      Seq("event_type", "day"), col("user_id"), append = true)
    val fromStore = SketchOps.readHllStore(spark, store, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the merged persisted registers must equal a single-pass sketch over
    // the whole corpus at the same lgK: HLL register union is
    // max-commutative, so batch boundaries and file layout cannot matter
    val oneShot = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(12))).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromStore == oneShot,
      "persisted+unioned sketches must equal the one-shot sketch exactly")
    // and the estimates are actually close to truth
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fromStore.foreach { case (t, est) =>
      assert(math.abs(est - exact(t)) <= 0.05 * exact(t), s"$t: $est vs ${exact(t)}")
    }
    // per-(type, day) cells roll up to coarser and finer groupings alike
    val perDay = SketchOps.readHllStore(spark, store, Seq("event_type", "day"))
    assert(perDay.count() ==
      ev.select("event_type", "day").distinct().count())
    // compaction: one blob per cell afterwards, identical estimates
    SketchOps.compactHllStore(spark, store, Seq("event_type", "day"))
    assert(spark.read.parquet(store).count() ==
      ev.select("event_type", "day").distinct().count(),
      "compaction must leave exactly one blob per cell")
    val afterCompact = SketchOps.readHllStore(spark, store, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterCompact == fromStore, "compaction must not change estimates")
  }

  // ------------------------------------------------------- HDR quantiles

  test("hdrBucket: exact small values, top-bits-kept large values, integer edges") {
    val vals = Seq(0L, 1L, 31L, 32L, 33L, 63L, 64L, 65L, 255L, 256L, 257L,
      1000L, 12345L, (1L << 40) + 12345L, -7L, -65L, -12345L)
    val got = vals.toDF("v")
      .select(SketchOps.hdrBucket(col("v"), subBits = 5).as("b"))
      .collect().map(_.getLong(0)).toSeq
    def refPos(v: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val shift = math.max(0, e - 5)
      v - (v % (1L << shift))
    }
    def ref(v: Long): Long =
      if (v == 0) 0L else if (v > 0) refPos(v) else -refPos(-v)
    assert(got == vals.map(ref))
    // values below 2^(subBits+1) are EXACT (shift 0) — on both sign sides
    assert(ref(63) == 63 && ref(33) == 33 && ref(-7) == -7)
    // 65 = 0b1000001 keeps top 6 bits → 64; negatives mirror on |v|
    assert(ref(65) == 64 && ref(12345) == 12288 && ref(-12345) == -12288)
    // mirrored bucketing is idempotent on its own outputs (store re-folds)
    vals.foreach(v => assert(ref(ref(v)) == ref(v)))
  }

  test("hdr sketch merge: sketch(parts) summed == sketch(whole), any split") {
    val df = spark.range(0, 20000)
      .select((col("id") % 3).cast("string").as("g"),
        (pmod(col("id") * 2654435761L, lit(1000000L)) + 1).as("v"))
    val whole = SketchOps.hdrBucketTable(df, col("g"), col("v"))
    val merged = SketchOps.hdrMerge(
      SketchOps.hdrBucketTable(df.filter(col("v") % 2 === 0), col("g"), col("v")),
      SketchOps.hdrBucketTable(df.filter(col("v") % 2 =!= 0), col("g"), col("v")))
    val a = whole.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = merged.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b, "bucket tables are a sum monoid")
    // and the quantiles read identically off either state
    val qa = SketchOps.hdrQuantilesFromTable(whole).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val qb = SketchOps.hdrQuantilesFromTable(merged).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(qa == qb)
  }

  test("hdr_percentile aggregate ≡ the bucket-table walk on adversarial " +
    "values, any partitioning") {
    import graft.expressions.HdrPercentile.hdrPercentile
    // negatives (mirrored buckets), zero, exact small values, bucket
    // edges, and a >2^40 tail — three groups, deterministic
    val df = spark.range(0, 30000)
      .select((col("id") % 3).cast("string").as("g"),
        when(col("id") % 11 === 0, -(col("id") % 97))
          .when(col("id") % 7 === 0, col("id") % 64)
          .when(col("id") % 5 === 0,
            (col("id") * 2654435761L) % 9999991L + lit(1L << 40))
          .otherwise(pmod(col("id") * 48271L, lit(1000000L)))
          .cast("long").as("v"))
    def aggOf(d: org.apache.spark.sql.DataFrame) = d.groupBy("g").agg(
        hdrPercentile(col("v"), 0.5).as("p50_b"),
        hdrPercentile(col("v"), 0.9).as("p90_b"),
        hdrPercentile(col("v"), 0.99).as("p99_b"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val walk = SketchOps.hdrQuantiles(df, col("g"), col("v")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val one = aggOf(df.repartition(1))
    val many = aggOf(df.repartition(13))
    assert(one == walk, "aggregate must equal the table walk")
    assert(many == one,
      "partial merge + serde across partitions must not move any rank")
    // weighted pre-bucketed folding (the store-serving path) agrees too
    val pre = SketchOps.hdrBucketTable(df, col("g"), col("v"))
    val folded = pre.groupBy("g").agg(
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.HdrPercentile(
            org.apache.spark.sql.GraftColumnBridge.expression(col("b")),
            org.apache.spark.sql.GraftColumnBridge.expression(col("n")),
            5000, 5).toAggregateExpression()).as("p50_b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded == walk.map { case (k, v) => k -> v._1 })
  }

  test("hdr quantile estimates carry the 2^-subBits relative-error bound") {
    val subBits = 5
    val df = spark.range(1, 50001)
      .select(lit("g").as("g"),
        (pmod(col("id") * 48271L, lit(9999991L)) + 1).as("v"))
    val est = SketchOps.hdrQuantiles(df, col("g"), col("v"), subBits)
      .collect()(0)
    val exact = df.selectExpr(
      "percentile(v, 0.5) AS p50", "percentile(v, 0.9) AS p90",
      "percentile(v, 0.99) AS p99").collect()(0)
    def check(got: Long, want: Double, name: String): Unit = {
      // bucket lower bound: within one bucket width BELOW the true value
      assert(got <= want * (1 + math.pow(2, -subBits)) &&
        got >= want * (1 - 2 * math.pow(2, -subBits)),
        s"$name: est $got vs exact $want")
    }
    check(est.getLong(1), exact.getDouble(0), "p50")
    check(est.getLong(2), exact.getDouble(1), "p90")
    check(est.getLong(3), exact.getDouble(2), "p99")
    assert(est.getLong(4) == 50000L)
  }
}
