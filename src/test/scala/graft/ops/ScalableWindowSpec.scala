package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase global-window ops must agree exactly with the naive
  * single-partition Window plans they replace. */
class ScalableWindowSpec extends SparkTestBase {

  private lazy val orders = spark.read.parquet(s"$sfSmall/orders.parquet")
    .select("o_orderkey", "o_totalprice")

  test("prefixSumExclusive equals the single-partition running sum") {
    val naive = orders
      .select(col("o_orderkey"),
        coalesce(sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(Window.orderBy("o_orderkey")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0))
          .cast("double").as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scalable = ScalableWindow.prefixSumExclusive(
      orders.select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("v")),
      Seq("o_orderkey"), col("v"), "p")
      .select(col("o_orderkey"), col("p").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scalable == naive)
  }

  test("rowNumber equals the single-partition row_number") {
    val naive = orders
      .select(col("o_orderkey"),
        row_number().over(Window.orderBy("o_orderkey")).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val scalable = ScalableWindow.rowNumber(
      orders.select("o_orderkey"), Seq("o_orderkey"), "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // long out (no 2^31 wrap)
    assert(scalable == naive)
  }

  test("lag1/lead1 equal the single-partition lag/lead incl. boundaries") {
    val naiveLag = orders
      .select(col("o_orderkey"),
        lag("o_totalprice", 1).over(Window.orderBy("o_orderkey")).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val scalLag = ScalableWindow.lag1(orders, Seq("o_orderkey"),
      "o_totalprice", "v")
      .select("o_orderkey", "v")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(scalLag == naiveLag)

    val naiveLead = orders
      .select(col("o_orderkey"),
        coalesce(lead("o_totalprice", 1).over(Window.orderBy("o_orderkey")),
          lit(-1.0)).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scalLead = ScalableWindow.lead1(orders, Seq("o_orderkey"),
      "o_totalprice", "v", lit(-1.0))
      .select("o_orderkey", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scalLead == naiveLead)
  }

  test("fillBackward equals the single-partition backward fill") {
    val df = orders.withColumn("v",
      when(col("o_orderkey") % 7 === 0, col("o_totalprice")))
    val naive = df.select(col("o_orderkey"),
      first("v", ignoreNulls = true).over(Window.orderBy("o_orderkey")
        .rowsBetween(0, Window.unboundedFollowing)).as("f"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val scal = ScalableWindow.fillBackward(df, Seq("o_orderkey"), col("v"), "f")
      .select("o_orderkey", "f")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(scal == naive)
  }

  test("rank family equals the single-partition forms on tie-heavy keys") {
    // full-key ties abound: 7 categories × ~coarse price buckets, so
    // rank gaps, dense runs, and peer-group cume_dist all exercise for
    // real, including key groups that straddle range-bucket boundaries
    val df = orders.select(col("o_orderkey"),
      (col("o_orderkey") % 7).cast("string").as("cat"),
      floor(col("o_totalprice") / 10000).as("pb"))
    val w = Window.orderBy("cat", "pb")
    val naive = df.select(col("o_orderkey"),
      org.apache.spark.sql.functions.rank().over(w).cast("long").as("r"),
      dense_rank().over(w).cast("long").as("d"),
      percent_rank().over(w).as("p"),
      cume_dist().over(w).as("c"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    val ord = Seq("cat", "pb")
    val scal = ScalableWindow.cumeDist(
      ScalableWindow.percentRank(
        ScalableWindow.denseRank(
          ScalableWindow.rank(df, ord, "r"), ord, "d"), ord, "p"),
      ord, "c")
      .select("o_orderkey", "r", "d", "p", "c")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(scal == naive)
    // the fused one-pass form computes the identical four columns
    val fused = ScalableWindow.rankFamily(df, ord, "r", "d", "p", "c")
      .select("o_orderkey", "r", "d", "p", "c")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(fused == naive)
  }

  test("ntile equals the native global form; N < t degenerates to rn") {
    val w = Window.orderBy("o_totalprice", "o_orderkey")
    val naive = orders
      .select(col("o_orderkey"),
        org.apache.spark.sql.functions.ntile(7).over(w).cast("long").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scal = ScalableWindow.ntile(orders,
      Seq("o_totalprice", "o_orderkey"), 7, "t")
      .select("o_orderkey", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scal == naive)
    // N < t: every row is its own tile, in order
    val five = orders.orderBy("o_orderkey").limit(5)
    val tiny = ScalableWindow.ntile(five, Seq("o_orderkey"), 13, "t")
      .orderBy("o_orderkey").select("t")
      .collect().map(_.getLong(0)).toSeq
    assert(tiny == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("rank family degenerate shapes: single row and all-equal keys") {
    val one = orders.limit(1).select(col("o_orderkey"), lit("x").as("k"))
    val r1 = ScalableWindow.percentRank(one, Seq("k"), "p")
      .select("p").head().getDouble(0)
    assert(r1 == 0.0) // N == 1: (rank-1)/(N-1) is 0, not NaN
    val eq = orders.limit(100).select(col("o_orderkey"), lit("x").as("k"))
    val rows = ScalableWindow.cumeDist(
      ScalableWindow.denseRank(
        ScalableWindow.rank(eq, Seq("k"), "r"), Seq("k"), "d"),
      Seq("k"), "c")
      .select("r", "d", "c").distinct().collect()
    assert(rows.length == 1) // every row is a peer of every other
    assert(rows.head.getLong(0) == 1L && rows.head.getLong(1) == 1L &&
      rows.head.getDouble(2) == 1.0)
  }

  test("one full-data shuffle; deterministic buckets, no sampled exchange") {
    // snapshot, not isEmpty: OTHER suites sharing this SparkContext pin
    // RDDs by design (CC final-round checkpoints, the cached-centroid
    // memo), and suite order must not decide this test. The invariant is
    // that THIS op pins nothing new.
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val df = ScalableWindow.rowNumber(
      orders.select("o_orderkey"), Seq("o_orderkey"), "rn")
    df.collect() // materialize so AQE's final plan is visible
    val p = df.queryExecution.executedPlan.toString
    // the bucket id is a literal-boundary expression, NOT a sampled range
    // exchange — correctness must not depend on ReuseExchange collapsing
    // the main and carry branches onto one sampling
    assert(!p.contains("rangepartitioning"), p)
    // the window's input is hash-clustered by the bucket column
    assert(p.contains("hashpartitioning(__swb"), p)
    // and no cache leak: nothing newly persisted by the op
    assert(spark.sparkContext.getPersistentRDDs.keySet == pinnedBefore)
  }

  test("carries stay exact when branch plans CANNOT share an exchange") {
    // regression for the pid-divergence bug: over a DSv2 source the main
    // and carry branches plan separate scans, so any sampled partitioning
    // would diverge between them; deterministic buckets must agree.
    // lead1's endVpos must equal the successor's vpos for EVERY record.
    val fx = graft.bam.fixtures.BamFixture.cached("swdet", n = 3000,
      seed = 33, payloadSize = 1024)
    val vpos = shiftleft(col("virtualPos.blockPos"), 16)
      .bitwiseOR(col("virtualPos.offset").cast("long"))
    val recs = spark.read.format("bam").load(fx.bamPath)
      .select(vpos.as("vpos64"))
    val withEnd = ScalableWindow.lead1(
      recs, Seq("vpos64"), "vpos64", "endVpos", lit(-1L))
    val rows = withEnd.orderBy("vpos64").collect()
    rows.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getAs[Long]("endVpos") == w(1).getAs[Long]("vpos64"),
          s"non-successor endVpos: ${w(0)} -> ${w(1)}")
    }
    assert(rows.last.getAs[Long]("endVpos") == -1L)
  }

  test("lag1 null predecessor value stays null (carry gated on row 1)") {
    import spark.implicits._
    // value null at keys 2 and 5; naive lag: k=3 -> null (pred value null),
    // k=1 -> null (no pred). Carry must not substitute for k=3/k=6.
    val df = Seq((1L, Some(10.0)), (2L, None), (3L, Some(30.0)),
      (4L, Some(40.0)), (5L, None), (6L, Some(60.0)))
      .toDF("k", "v")
    val naive = df.select(col("k"),
      lag("v", 1).over(Window.orderBy("k")).as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val scal = ScalableWindow.lag1(df, Seq("k"), "v", "p")
      .select("k", "p")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(scal == naive)
  }

  test("string-keyed global order: rowNumber/lag1/prefixSum match naive plans") {
    val docs = spark.read.parquet(s"$sfSmall/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n"))
      // composite string key, unique per row so naive/scalable orders agree
      .withColumn("k", concat_ws("#", col("lang"), lpad(col("doc_id"), 8, "0")))
    val naiveRn = docs
      .select(col("doc_id"), row_number().over(Window.orderBy("k")).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val gotRn = ScalableWindow.rowNumber(docs, Seq("k"), "rn")
      .select("doc_id", "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotRn == naiveRn)
    // the string path must actually SPREAD buckets (no silent collapse
    // to bucket 0, which is what the old cast-to-double did)
    val spread = ScalableWindow.bucketed(docs, Seq("k"))
      .select(ScalableWindow.Pid).distinct().count()
    assert(spread > 8, s"string key must spread buckets, got $spread")

    val naiveLag = docs
      .select(col("doc_id"), lag("n", 1).over(Window.orderBy("k")).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val gotLag = ScalableWindow.lag1(docs, Seq("k"), "n", "v")
      .select("doc_id", "v")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(gotLag == naiveLag)

    val naivePs = docs
      .select(col("doc_id"),
        coalesce(sum("n").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotPs = ScalableWindow.prefixSumExclusive(docs, Seq("k"), col("n"), "p")
      .select("doc_id", "p")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotPs == naivePs)
  }

  test("multi-column order key: string prefix + numeric tiebreaker") {
    val docs = spark.read.parquet(s"$sfSmall/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n"))
    // lang has heavy ties: doc_id breaks them inside each bucket's window
    val naive = docs
      .select(col("doc_id"),
        row_number().over(Window.orderBy("lang", "doc_id")).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = ScalableWindow.rowNumber(docs, Seq("lang", "doc_id"), "rn")
      .select("doc_id", "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive)
    // a tie-heavy leading key must NOT collapse parallelism to #distinct
    // leading values: boundaries extend lexicographically into doc_id
    val nLangs = docs.select("lang").distinct().count()
    val spread = ScalableWindow.bucketed(docs, Seq("lang", "doc_id"))
      .select(ScalableWindow.Pid).distinct().count()
    assert(spread > nLangs,
      s"composite boundaries must out-spread the $nLangs leading values, got $spread")
  }

  test("an unsupported leading key type fails loudly, not silently") {
    val df = spark.range(10).select(array(col("id")).as("a"), col("id"))
    val e = intercept[IllegalArgumentException] {
      ScalableWindow.rowNumber(df, Seq("a", "id"), "rn")
    }
    assert(e.getMessage.contains("unsupported leading order-key type"))
  }

  test("timestamp-keyed order works through the epoch bucketing") {
    val ev = spark.read.parquet(s"$sfSmall/events.parquet")
      .select(col("event_id"), col("ts")).limit(5000)
      .dropDuplicates("ts") // unique keys so naive/scalable orders agree
    val naive = ev
      .select(col("event_id"), row_number().over(Window.orderBy("ts")).as("rn"))
      .collect().map(r => r.get(0) -> r.getInt(1).toLong).toMap
    val got = ScalableWindow.rowNumber(ev, Seq("ts"), "rn")
      .select("event_id", "rn")
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    assert(got == naive)
  }

  test("timestamp_ntz keys bucket monotonically across a DST gap") {
    // NTZ wall-clock 02:00-03:00 does not exist in America/New_York on
    // 2026-03-08; casting through session-zone instants resolves 02:30
    // PAST 03:00, inverting bucket order near a boundary — the key must
    // come from timezone-free field arithmetic instead
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val df = spark.range(0, 180).select(col("id"),
        expr("timestampadd(MINUTE, CAST(id AS INT), " +
          "TIMESTAMP_NTZ '2026-03-08 01:00:00')").as("t"))
      val naive = df
        .select(col("id"), row_number().over(Window.orderBy("t")).as("rn"))
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      val got = ScalableWindow.rowNumber(df, Seq("t"), "rn")
        .select("id", "rn")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("the plan has no partition-less Window") {
    val df = ScalableWindow.rowNumber(
      orders.select("o_orderkey"), Seq("o_orderkey"), "rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    // a partitioned window spec lists the partition expression before ORDER
    assert(!plan.contains("windowspecdefinition(o_orderkey ASC"),
      "window must be partitioned by the bucket id")
  }
}
