package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps
import graft.streaming.EventOps

/** Event-stream (batch-parity) and multimodal queries. The streaming forms
  * of the event ops are exercised with MemoryStream in ScalaTest; here the
  * identical logic runs in batch under the DuckDB oracle.
  */
object EventQueries {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q = Q(name, run, Some(oracle))
  private def qq(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)

  /** One GENUINE binary P6 PPM per document: canonical header + an
    * 8×8 RGB raster whose 192 bytes are the ASCII codes of six chained md5
    * hex digests of the doc id — fully deterministic, fully rebuildable by
    * an independent engine (the mm_decode_ppm / mm_resize_ppm oracles do).
    * Columnar construction: concat of binary literals and md5 exprs, no
    * UDF. */
  private def ppmMediaTable(docs: DataFrame): DataFrame = {
    val header = lit("P6\n8 8\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val raster = concat((0 to 5).map(k =>
      md5(concat(col("doc_id").cast("string"), lit(s"-$k")))): _*).cast("binary")
    docs.select(col("doc_id").cast("long").as("media_id"),
      lit("image").as("media_type"),
      concat(header, raster).as("payload"))
  }

  val all: Seq[Q] = Seq(
    // ---- Tumbling-window aggregation (streaming's bread and butter).
    q(
      "ev_window_agg",
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      tEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(unix_micros(col("w.start")).as("win_start_us"),
          col("event_type"), col("n"), col("total_value"))
    },

    // ---- Window-over-window spike detection: hourly counts per type,
    // each window compared to its predecessor via a PARTITIONED lag (no
    // global window). The ratio is one double division of two exact
    // integer counts — deterministic in both engines — and rounds
    // half-away-from-zero identically.
    q(
      "ev_spike",
      """WITH w AS (
        |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS win_us,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, win_us, n, prev_n,
        |  ROUND(CAST(n AS DOUBLE) / prev_n, 4) AS ratio
        |FROM (
        |  SELECT event_type, win_us, n,
        |    LAG(n) OVER (PARTITION BY event_type ORDER BY win_us) AS prev_n
        |  FROM w)
        |WHERE prev_n IS NOT NULL""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = tEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), unix_micros(col("w.start")).as("win_us"),
          col("n"))
      val lagW = Window.partitionBy("event_type").orderBy("win_us")
      w.withColumn("prev_n", lag("n", 1).over(lagW))
        .filter(col("prev_n").isNotNull)
        .select(col("event_type"), col("win_us"), col("n"), col("prev_n"),
          round(col("n").cast("double") / col("prev_n"), 4).as("ratio"))
    },

    // ---- Pivot: long→wide reshape with an EXPLICIT value list (an
    // unlisted pivot would first collect the distinct values to the
    // driver — a hidden extra job and a scale hazard; with the list the
    // plan is one pass of conditional aggregates, same as the FILTER
    // clauses DuckDB runs).
    q(
      "ev_pivot",
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      tEvents(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0)
    },

    // ---- Sliding-window aggregation: each event lands in width/slide
    // (= 4) overlapping windows. Spark expands via a single generator —
    // no self-join; DuckDB replicates with the same 15-min grid
    // arithmetic (every event contributes to exactly the 4 grid starts
    // covering it, all within the 1-hour width by construction).
    q(
      "ev_sliding_agg",
      """WITH e AS (
        |  SELECT event_type,
        |    epoch_us(ts) - (epoch_us(ts) % 900000000) AS us15
        |  FROM events
        |), x AS (
        |  SELECT event_type,
        |    us15 - 900000000 * UNNEST(GENERATE_SERIES(0, 3)) AS win_start_us
        |  FROM e
        |)
        |SELECT win_start_us, event_type, COUNT(*) AS n
        |FROM x GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      tEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("w.start")).as("win_start_us"),
          col("event_type"), col("n"))
    },

    // ---- Native session windows: Spark's `session_window` (the operator
    // the streaming engine uses for watermark-evicted sessions) run in
    // batch under the oracle. Semantics pinned by the SQL twin: a session
    // breaks when the gap is >= 30 min (session_window merges windows
    // that OVERLAP — an exact-gap event does not), and the window end is
    // last-event-time + gap, not last event time.
    q(
      "ev_session_native",
      """SELECT user_id, MIN(us) AS start_us,
        |  MAX(us) + 1800000000 AS end_us, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (
        |  SELECT user_id, value, us,
        |    CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM (
        |    SELECT user_id, value, epoch_us(ts) AS us,
        |      CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY epoch_us(ts)) >= 1800000000
        |        THEN 1 ELSE 0 END AS gap
        |    FROM events))
        |GROUP BY user_id, sid""".stripMargin
    ) { (s, dir) =>
      tEvents(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"),
          col("n_events"), col("total_value"))
    },

    // ---- View→click attribution: the interval self-join (equi-key on
    // user + time-range bound), batch form; the stream-stream watermarked
    // twin runs on the same definition in StreamingSpec. Inner join by
    // design — unattributed clicks emit nothing.
    q(
      "ev_attrib",
      """SELECT c.event_id AS click_id, c.user_id, epoch_us(c.ts) AS click_us,
        |  COUNT(*) AS n_views, MAX(v.event_id) AS last_view_id
        |FROM events c JOIN events v
        |  ON c.event_type = 'click' AND v.event_type = 'view'
        |  AND v.user_id = c.user_id
        |  AND v.ts <= c.ts AND v.ts > c.ts - INTERVAL 60 MINUTE
        |GROUP BY 1, 2, 3""".stripMargin
    ) { (s, dir) =>
      EventOps.attributeClicksBatch(tEvents(s, dir), windowMinutes = 60)
    },

    // ---- Semi-structured extraction: the JSON `props` column parsed
    // per-row (codegen'd get_json_object — no UDF) and aggregated.
    q(
      "ev_json",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(DISTINCT CAST(props->>'k' AS BIGINT)) AS n_k
        |FROM events GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      tEvents(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          countDistinct("k").as("n_k"))
    },

    // ---- Gap-based sessionization, batch form (stream parity in spec).
    q(
      "ev_sessionize",
      """SELECT user_id, session_id, MIN(us) AS start_us, MAX(us) AS end_us,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (
        |  SELECT user_id, value, us,
        |    CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, value, epoch_us(ts) AS us,
        |      CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000
        |        THEN 1 ELSE 0 END AS gap
        |    FROM events))
        |GROUP BY user_id, session_id""".stripMargin
    ) { (s, dir) =>
      EventOps.sessionizeBatch(tEvents(s, dir))
    },

    // ---- Session conversion: of all 30-min-gap sessions, how many
    // contain a purchase — the sessionization machinery composed with a
    // per-session flag, then ONE global scalar row (integer counts +
    // a ppm rate, so the division is exact on both sides).
    q(
      "ev_session_conv",
      """WITH s AS (
        |  SELECT user_id, session_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p
        |  FROM (
        |    SELECT user_id, event_type,
        |      CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY us
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |        AS session_id
        |    FROM (
        |      SELECT user_id, event_type, epoch_us(ts) AS us,
        |        CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
        |          (PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000
        |          THEN 1 ELSE 0 END AS gap
        |      FROM events))
        |  GROUP BY user_id, session_id
        |)
        |SELECT COUNT(*) AS n_sessions,
        |  CAST(SUM(has_p) AS BIGINT) AS n_purchase_sessions,
        |  CAST(SUM(has_p) * 1000000 // COUNT(*) AS BIGINT) AS conv_ppm
        |FROM s""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us")
      val sessions = tEvents(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap",
          when(col("us") - lag("us", 1).over(w) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum("gap").over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("has_p"))
      sessions.agg(
        count(lit(1)).as("n_sessions"),
        sum("has_p").cast("long").as("n_purchase_sessions"),
        expr("sum(has_p) * 1000000 div count(1)").as("conv_ppm"))
    },

    // ---- Top event types per day (rank in window).
    q(
      "ev_top_types",
      """SELECT CAST(day AS VARCHAR) AS day, event_type, n, rank FROM (
        |  SELECT day, event_type, n, ROW_NUMBER() OVER
        |    (PARTITION BY day ORDER BY n DESC, event_type) AS rank
        |  FROM (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
        |        FROM events GROUP BY 1, 2))
        |WHERE rank <= 3""".stripMargin
    ) { (s, dir) =>
      EventOps.topTypesPerDay(tEvents(s, dir))
        .withColumn("rank", col("rank").cast("long"))
    },

    // ---- Path analysis: the first-order Markov transition matrix of
    // per-user event sequences — LEAD over (user, time) pairs adjacent
    // events, then the |types|²-bounded aggregate carries the transition
    // counts and their within-source probabilities in exact integer ppm
    // (the tiny per-from_type window rides the AGGREGATED frame, never
    // the corpus — the a_rev_share bounded-domain pattern).
    q(
      "ev_transitions",
      """WITH o AS (
        |  SELECT user_id, event_type, LEAD(event_type) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        |  FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS p_ppm
        |FROM t""".stripMargin
    ) { (s, dir) =>
      EventOps.transitionsBatch(tEvents(s, dir))
        .orderBy("from_type", "to_type")
    },

    // ---- Incrementally-maintained EXACT quantiles: the value domain is
    // 2-decimal money, so an integer-cent histogram is LOSSLESS — and a
    // histogram is a sum-monoid, so the maintained rollup store
    // (IncrementalAggOps: 80% build + 20% fold, bucket-local merges)
    // carries it incrementally and quantile reconstruction is a
    // cumulative-sum walk over the |types|·|distinct cents| bounded
    // frame. No sketch, no approximation: p50/p90 from the STORE must
    // hash-equal DuckDB's walk over the raw corpus. (Contrast
    // a_quantile_approx, which gates the GK sketch for unbounded
    // domains.)
    q(
      "ev_quantile_store",
      """WITH h AS (
        |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, cents, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
        |    SUM(n) OVER (PARTITION BY event_type) AS tot
        |  FROM h)
        |SELECT event_type,
        |  CAST(MIN(CASE WHEN cum * 2 >= tot THEN cents END) AS BIGINT) AS p50_cents,
        |  CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN cents END) AS BIGINT) AS p90_cents,
        |  CAST(MIN(tot) AS BIGINT) AS n_total
        |FROM c GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.IncrementalAggOps
      import org.apache.spark.sql.expressions.Window
      val base = scratchDir("graft-qstore")
      val prepped = tEvents(s, dir).select(
        col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        lit(1L).as("n"))
      val keys = Seq("event_type", "cents")
      IncrementalAggOps.writeAggStore(
        prepped.filter(col("event_id") % 5 =!= 0).drop("event_id"),
        s, base, keys, Seq("n"), nBuckets = 16)
      IncrementalAggOps.mergeIntoAggStore(
        prepped.filter(col("event_id") % 5 === 0).drop("event_id"),
        s, base, keys, Seq("n"), nBuckets = 16)
      val byCents = Window.partitionBy("event_type").orderBy("cents")
      val all = Window.partitionBy("event_type")
      IncrementalAggOps.readAggStore(s, base)
        .withColumn("cum", sum("n").over(byCents))
        .withColumn("tot", sum("n").over(all))
        .groupBy("event_type")
        .agg(
          min(when(col("cum") * 2 >= col("tot"), col("cents")))
            .as("p50_cents"),
          min(when(col("cum") * 10 >= col("tot") * 9, col("cents")))
            .as("p90_cents"),
          min("tot").as("n_total"))
        .orderBy("event_type")
    },

    // ---- HDR-sketch quantiles UNDER THE ORACLE (general-domain
    // complement to ev_quantile_store's exact bounded-domain histogram):
    // log2 sub-bucketed counts (SketchOps.hdrBucket — top 6 significant
    // bits kept, pure integer arithmetic; floor-log2 from the unpadded
    // binary-string length in BOTH engines, never floating log2) walked
    // to p50/p90/p99 bucket lower bounds. DuckDB replicates the bucket
    // formula and the cumulative walk exactly — equal hashes pin the
    // bucketing arithmetic AND the rank selection. Mergeability and the
    // 2^-5 relative-error bound are property-tested in SketchSpec.
    q(
      "ev_hdr_quantile",
      """WITH v AS (
        |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), h AS (
        |  SELECT event_type,
        |    CASE WHEN cents > 0 THEN cents - (cents % (CAST(1 AS BIGINT) <<
        |           CAST(GREATEST(0, length(bin(cents)) - 1 - 5) AS INT)))
        |         WHEN cents < 0 THEN -((-cents) - ((-cents) % (CAST(1 AS BIGINT) <<
        |           CAST(GREATEST(0, length(bin(-cents)) - 1 - 5) AS INT))))
        |         ELSE 0
        |    END AS b,
        |    COUNT(*) AS n
        |  FROM v GROUP BY 1, 2
        |), c AS (
        |  SELECT event_type, b, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY b) AS cum,
        |    SUM(n) OVER (PARTITION BY event_type) AS tot
        |  FROM h
        |)
        |SELECT event_type,
        |  CAST(MIN(CASE WHEN cum * 2 >= tot THEN b END) AS BIGINT) AS p50_b,
        |  CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN b END) AS BIGINT) AS p90_b,
        |  CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN b END) AS BIGINT) AS p99_b,
        |  CAST(MIN(tot) AS BIGINT) AS n_total
        |FROM c GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      graft.ops.SketchOps.hdrQuantiles(
        tEvents(s, dir),
        col("event_type"),
        round(col("value") * 100).cast("long"),
        subBits = 5)
        .withColumnRenamed("g", "event_type")
        .orderBy("event_type")
    },

    // ---- HDR sketch MAINTAINED BY THE AGG STORE: the (group, bucket)
    // count table is a sum monoid, so the incremental rollup store
    // carries it natively — 80% of events build the store, 20% arrive as
    // a bucket-local merge, and p50/p90/p99 read off the MAINTAINED
    // buckets must hash-equal DuckDB's walk over the whole corpus (same
    // oracle as ev_hdr_quantile: the store's split/merge provably
    // changed nothing).
    q(
      "ev_hdr_store",
      """WITH v AS (
        |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), h AS (
        |  SELECT event_type,
        |    CASE WHEN cents > 0 THEN cents - (cents % (CAST(1 AS BIGINT) <<
        |           CAST(GREATEST(0, length(bin(cents)) - 1 - 5) AS INT)))
        |         WHEN cents < 0 THEN -((-cents) - ((-cents) % (CAST(1 AS BIGINT) <<
        |           CAST(GREATEST(0, length(bin(-cents)) - 1 - 5) AS INT))))
        |         ELSE 0
        |    END AS b,
        |    COUNT(*) AS n
        |  FROM v GROUP BY 1, 2
        |), c AS (
        |  SELECT event_type, b, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY b) AS cum,
        |    SUM(n) OVER (PARTITION BY event_type) AS tot
        |  FROM h
        |)
        |SELECT event_type,
        |  CAST(MIN(CASE WHEN cum * 2 >= tot THEN b END) AS BIGINT) AS p50_b,
        |  CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN b END) AS BIGINT) AS p90_b,
        |  CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN b END) AS BIGINT) AS p99_b,
        |  CAST(MIN(tot) AS BIGINT) AS n_total
        |FROM c GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.{IncrementalAggOps, SketchOps}
      val base = scratchDir("graft-hdrstore")
      def sketch(part: org.apache.spark.sql.DataFrame) =
        SketchOps.hdrBucketTable(part,
          col("event_type"), round(col("value") * 100).cast("long"))
      val ev = tEvents(s, dir)
      IncrementalAggOps.writeAggStore(
        sketch(ev.filter(col("event_id") % 5 =!= 0)),
        s, base, Seq("g", "b"), Seq("n"), nBuckets = 16)
      IncrementalAggOps.mergeIntoAggStore(
        sketch(ev.filter(col("event_id") % 5 === 0)),
        s, base, Seq("g", "b"), Seq("n"), nBuckets = 16)
      SketchOps.hdrQuantilesFromTable(IncrementalAggOps.readAggStore(s, base))
        .withColumnRenamed("g", "event_type")
        .orderBy("event_type")
    },

    // ---- HDR quantiles SERVED AT QUERY-REWRITE LEVEL: the raw
    // `fact.groupBy(event_type).agg(hdr_percentile(cents, p))` aggregate
    // below never names the store — AggStoreRewrite matches the native
    // HdrPercentile aggregate against the registered hdr rollup and
    // re-folds the store's (bucket, count) rows instead of scanning the
    // fact (plan-asserted in AggRewriteSpec; exact because the bucket
    // function is idempotent on its lower bounds and counts are sums).
    // The store is built from 80% and merged with 20%, so equal hashes
    // prove build + fold + rewrite end-to-end against DuckDB's direct
    // walk over the whole corpus. At 100 TB this is the difference
    // between a corpus scan and reading ≤ 64·2^subBits rows per key.
    q(
      "agg_hdr_serve",
      """WITH v AS (
        |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), h AS (
        |  SELECT event_type,
        |    CASE WHEN cents > 0 THEN cents - (cents % (CAST(1 AS BIGINT) <<
        |           CAST(GREATEST(0, length(bin(cents)) - 1 - 5) AS INT)))
        |         WHEN cents < 0 THEN -((-cents) - ((-cents) % (CAST(1 AS BIGINT) <<
        |           CAST(GREATEST(0, length(bin(-cents)) - 1 - 5) AS INT))))
        |         ELSE 0
        |    END AS b,
        |    COUNT(*) AS n
        |  FROM v GROUP BY 1, 2
        |), c AS (
        |  SELECT event_type, b, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY b) AS cum,
        |    SUM(n) OVER (PARTITION BY event_type) AS tot
        |  FROM h
        |)
        |SELECT event_type,
        |  CAST(MIN(CASE WHEN cum * 2 >= tot THEN b END) AS BIGINT) AS p50_b,
        |  CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN b END) AS BIGINT) AS p90_b,
        |  CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN b END) AS BIGINT) AS p99_b
        |FROM c GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.expressions.HdrPercentile.hdrPercentile
      import graft.ops.IncrementalAggOps
      import graft.plans.AggStoreRegistry
      val base = scratchDir("graft-hdrserve")
      val prep = s"$base/events_cents.parquet"
      val store = s"$base/store"
      tEvents(s, dir)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .write.mode("overwrite").parquet(prep)
      val ev = s.read.parquet(prep)
      IncrementalAggOps.writeHdrStore(ev.filter(col("cents") % 5 =!= 0),
        s, store, Seq("event_type"), "cents", nBuckets = 8)
      IncrementalAggOps.mergeIntoHdrStore(ev.filter(col("cents") % 5 === 0),
        s, store, Seq("event_type"), "cents", nBuckets = 8)
      AggStoreRegistry.clear()
      AggStoreRegistry.register(s, prep, store,
        Seq("event_type"), Seq("cents"), kinds = Seq("hdr"))
      ev.groupBy("event_type").agg(
          hdrPercentile(col("cents"), 0.5).as("p50_b"),
          hdrPercentile(col("cents"), 0.9).as("p90_b"),
          hdrPercentile(col("cents"), 0.99).as("p99_b"))
        .orderBy("event_type")
    },

    // ---- HDR quantiles served for a COARSER key subset: the store is
    // maintained at the finer (event_type, day) grain, the query groups
    // by event_type only — AggStoreRewrite re-folds the store's
    // (bucket, count) rows ACROSS the dropped key, exact because bucket
    // lower bounds are idempotent under re-bucketing and counts are
    // sums. Equal hashes against DuckDB's direct whole-corpus walk prove
    // one maintained fine-grained rollup answers every coarser
    // percentile query — at 100 TB, one store serves the whole rollup
    // lattice below it.
    q(
      "agg_hdr_rollup",
      """WITH v AS (
        |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), h AS (
        |  SELECT event_type,
        |    CASE WHEN cents > 0 THEN cents - (cents % (CAST(1 AS BIGINT) <<
        |           CAST(GREATEST(0, length(bin(cents)) - 1 - 5) AS INT)))
        |         WHEN cents < 0 THEN -((-cents) - ((-cents) % (CAST(1 AS BIGINT) <<
        |           CAST(GREATEST(0, length(bin(-cents)) - 1 - 5) AS INT))))
        |         ELSE 0
        |    END AS b,
        |    COUNT(*) AS n
        |  FROM v GROUP BY 1, 2
        |), c AS (
        |  SELECT event_type, b, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY b) AS cum,
        |    SUM(n) OVER (PARTITION BY event_type) AS tot
        |  FROM h
        |)
        |SELECT event_type,
        |  CAST(MIN(CASE WHEN cum * 2 >= tot THEN b END) AS BIGINT) AS p50_b,
        |  CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN b END) AS BIGINT) AS p90_b,
        |  CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN b END) AS BIGINT) AS p99_b,
        |  CAST(MIN(tot) AS BIGINT) AS n_rows
        |FROM c GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.expressions.HdrPercentile.hdrPercentile
      import graft.ops.IncrementalAggOps
      import graft.plans.AggStoreRegistry
      val base = scratchDir("graft-hdrrollup")
      val prep = s"$base/events_day.parquet"
      val store = s"$base/store"
      tEvents(s, dir)
        .select(col("event_type"), (col("event_id") % 7).as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .write.mode("overwrite").parquet(prep)
      val ev = s.read.parquet(prep)
      IncrementalAggOps.writeHdrStore(ev.filter(col("cents") % 5 =!= 0),
        s, store, Seq("event_type", "day"), "cents", nBuckets = 8)
      IncrementalAggOps.mergeIntoHdrStore(ev.filter(col("cents") % 5 === 0),
        s, store, Seq("event_type", "day"), "cents", nBuckets = 8)
      AggStoreRegistry.clear()
      AggStoreRegistry.register(s, prep, store,
        Seq("event_type", "day"), Seq("cents"), kinds = Seq("hdr"))
      ev.groupBy("event_type").agg(
          hdrPercentile(col("cents"), 0.5).as("p50_b"),
          hdrPercentile(col("cents"), 0.9).as("p90_b"),
          hdrPercentile(col("cents"), 0.99).as("p99_b"),
          count(lit(1)).as("n_rows"))
        .orderBy("event_type")
    },

    // ---- Dedup-on-ingest, batch form (watermark-bounded streaming form
    // parity-tested in StreamingSpec).
    q(
      "ev_dedup",
      """SELECT event_type, value, MIN(event_id) AS first_id, COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      EventOps.dedupBatch(tEvents(s, dir), Seq("event_type", "value"))
    },

    // ---- Multimodal: binary payload + metadata -> batched feature
    // extraction (decode stubbed; plumbing real). Rows-only. The registered
    // form projects the float vector to a stable scalar digest — the
    // driver's gate sorts rows with pandas and cannot hash array cells
    // (CORRECTNESS_r01); the array-typed API stays in MultimodalOps.
    qq("mm_features") { (s, dir) =>
      MultimodalOps.extractFeatures(
        MultimodalOps.fakeMediaTable(tDocs(s, dir)))
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          concat_ws(",",
            transform(col("features"), f => round(f.cast("double"), 6).cast("string")))
            .as("features_digest"))
        .orderBy("media_id")
    },

    // ---- Multimodal feature extraction UNDER THE ORACLE: the
    // mapPartitions codec stage really runs (same fakeMediaTable →
    // extractFeatures path as mm_features), and the ppm-integer features
    // it emits are replicated in DuckDB from first principles — the
    // payload is the document text's bytes (the corpus is ASCII, so
    // ord(char) IS the byte), bucketed byte counts are exact integers,
    // and the normalization is Long division to parts-per-million
    // (float-exact ≤ 10^6). One row per (media, bucket), zeros included —
    // the exploded form dodges the gate's no-array-cells limitation while
    // hash-comparing every feature value the codec computes.
    q(
      "mm_features_ppm",
      """WITH v AS (
        |  SELECT doc_id, (ord(substr(text, i, 1)) % 16) AS bucket
        |  FROM (SELECT doc_id, text, UNNEST(GENERATE_SERIES(1, STRLEN(text))) AS i
        |        FROM documents)
        |), cnt AS (
        |  SELECT doc_id, bucket, COUNT(*) AS c FROM v GROUP BY 1, 2
        |), fb AS (
        |  SELECT doc_id, STRLEN(text) AS n_bytes, UNNEST(GENERATE_SERIES(0, 15)) AS idx
        |  FROM documents
        |)
        |SELECT fb.doc_id AS media_id, CAST(fb.n_bytes AS BIGINT) AS n_bytes,
        |  CAST(fb.idx AS BIGINT) AS idx,
        |  CAST((COALESCE(cnt.c, 0) * 1000000) // GREATEST(fb.n_bytes, 1) AS REAL) AS feat
        |FROM fb LEFT JOIN cnt ON cnt.doc_id = fb.doc_id AND cnt.bucket = fb.idx""".stripMargin
    ) { (s, dir) =>
      MultimodalOps.extractFeatures(
        MultimodalOps.fakeMediaTable(tDocs(s, dir)), dim = 16)
        .select(col("media_id"), col("n_bytes"), posexplode(col("features")))
        .select(col("media_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("pos").cast("long").as("idx"), col("col").as("feat"))
    },

    // ---- Multimodal: frame sampling explode.
    qq("mm_frames") { (s, dir) =>
      MultimodalOps.sampleFrames(
        MultimodalOps.fakeMediaTable(tDocs(s, dir)))
        .orderBy("media_id", "frame_idx")
    },

    // ---- Frame sampling UNDER THE ORACLE: the same explode → every-Nth
    // filter → per-frame codec UDF as mm_frames, with the sliced frame
    // BYTES decoded to a string for the hash compare (the corpus is ASCII,
    // so the byte slice IS a substring DuckDB can produce; the gate can't
    // hash binary cells). n_frames and the stride come from the same
    // fakeMediaTable arithmetic the oracle replicates.
    q(
      "mm_frames_str",
      """WITH f AS (
        |  SELECT doc_id AS media_id, text,
        |    UNNEST(GENERATE_SERIES(0, CAST(doc_id % 8 AS INT))) AS frame_idx
        |  FROM documents
        |)
        |SELECT media_id, frame_idx, SUBSTR(text, frame_idx * 8 + 1, 8) AS frame
        |FROM f WHERE frame_idx % 2 = 0""".stripMargin
    ) { (s, dir) =>
      MultimodalOps.sampleFrames(
        MultimodalOps.fakeMediaTable(tDocs(s, dir)), everyNth = 2)
        .select(col("media_id"), col("frame_idx"),
          col("frame_bytes").cast("string").as("frame"))
    },

    // ---- Payload resize UNDER THE ORACLE: the codec's stride downsample
    // is pure index arithmetic (every ceil(len/64)-th byte), so DuckDB
    // rebuilds the resampled payload character-for-character from the
    // ASCII text the fake payload wraps. Exercises the same batched
    // mapPartitions seam as mm_features_ppm.
    q(
      "mm_resample_str",
      """SELECT doc_id AS media_id, LENGTH(text) AS n_bytes_in,
        |  ARRAY_TO_STRING(
        |    LIST_TRANSFORM(
        |      GENERATE_SERIES(1, LENGTH(text),
        |        GREATEST(1, (LENGTH(text) + 63) // 64)),
        |      i -> SUBSTR(text, CAST(i AS INT), 1)), '') AS resized
        |FROM documents""".stripMargin
    ) { (s, dir) =>
      MultimodalOps.resampleMedia(
        MultimodalOps.fakeMediaTable(tDocs(s, dir)), targetLen = 64)
        .select(col("media_id"), col("n_bytes_in"),
          col("resampled").cast("string").as("resized"))
    },

    // ---- REAL image decode under the oracle: each doc becomes a genuine
    // binary P6 PPM — "P6\n8 8\n255\n" + a 192-byte raster whose bytes are
    // the ASCII codes of six chained md5 hex digests (8·8·3 = 192 = 6·32;
    // md5 is the one hash both engines produce bit-identically). Spark
    // parses the image with the real Netpbm decoder (header grammar,
    // raster extraction — JvmMediaCodec, not byte arithmetic) and emits
    // integer per-channel sums; DuckDB rebuilds the identical raster
    // string and sums ord() at each channel's byte positions. Equal
    // hashes prove the DECODER — dims, header skip, channel interleave —
    // on every row.
    q(
      "mm_decode_ppm",
      """WITH m AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || '-0') || md5(CAST(doc_id AS VARCHAR) || '-1') ||
        |    md5(CAST(doc_id AS VARCHAR) || '-2') || md5(CAST(doc_id AS VARCHAR) || '-3') ||
        |    md5(CAST(doc_id AS VARCHAR) || '-4') || md5(CAST(doc_id AS VARCHAR) || '-5') AS ras
        |  FROM documents
        |), x AS (
        |  SELECT doc_id, ras, UNNEST(GENERATE_SERIES(1, 192)) AS i FROM m
        |)
        |SELECT doc_id AS media_id,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  CAST(SUM(CASE WHEN (i-1) % 3 = 0 THEN ord(substr(ras, CAST(i AS INT), 1)) ELSE 0 END) AS BIGINT) AS sum_r,
        |  CAST(SUM(CASE WHEN (i-1) % 3 = 1 THEN ord(substr(ras, CAST(i AS INT), 1)) ELSE 0 END) AS BIGINT) AS sum_g,
        |  CAST(SUM(CASE WHEN (i-1) % 3 = 2 THEN ord(substr(ras, CAST(i AS INT), 1)) ELSE 0 END) AS BIGINT) AS sum_b
        |FROM x GROUP BY doc_id""".stripMargin
    ) { (s, dir) =>
      MultimodalOps.imageStats(ppmMediaTable(tDocs(s, dir)))
    },

    // ---- REAL nearest-neighbor resize under the oracle: same genuine P6
    // payloads, decoded then scaled 8×8 → 4×4 by the real resizer (output
    // pixel (x,y) samples input (⌊x·8/4⌋, ⌊y·8/4⌋) = (2x, 2y)). DuckDB
    // replicates the SAMPLING ARITHMETIC itself — byte position
    // (2y·8 + 2x)·3 + c + 1 per output pixel/channel — so the hash pins
    // which pixels a resize keeps, not just that row counts agree.
    q(
      "mm_resize_ppm",
      """WITH m AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || '-0') || md5(CAST(doc_id AS VARCHAR) || '-1') ||
        |    md5(CAST(doc_id AS VARCHAR) || '-2') || md5(CAST(doc_id AS VARCHAR) || '-3') ||
        |    md5(CAST(doc_id AS VARCHAR) || '-4') || md5(CAST(doc_id AS VARCHAR) || '-5') AS ras
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, ras, UNNEST(GENERATE_SERIES(0, 15)) AS p FROM m
        |), c AS (
        |  SELECT doc_id, ras, (p % 4) AS x, (p // 4) AS y,
        |    UNNEST(GENERATE_SERIES(0, 2)) AS ch
        |  FROM px
        |)
        |SELECT doc_id AS media_id,
        |  CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
        |  CAST(SUM(CASE WHEN ch = 0 THEN ord(substr(ras, CAST((2*y*8 + 2*x)*3 + ch + 1 AS INT), 1)) ELSE 0 END) AS BIGINT) AS sum_r,
        |  CAST(SUM(CASE WHEN ch = 1 THEN ord(substr(ras, CAST((2*y*8 + 2*x)*3 + ch + 1 AS INT), 1)) ELSE 0 END) AS BIGINT) AS sum_g,
        |  CAST(SUM(CASE WHEN ch = 2 THEN ord(substr(ras, CAST((2*y*8 + 2*x)*3 + ch + 1 AS INT), 1)) ELSE 0 END) AS BIGINT) AS sum_b
        |FROM c GROUP BY doc_id""".stripMargin
    ) { (s, dir) =>
      MultimodalOps.imageStats(ppmMediaTable(tDocs(s, dir)),
        resizeTo = Some((4, 4)))
    },

    // ---- Perceptual image dedup (dHash) under the oracle: docs sharing
    // doc_id % 100 get the SAME md5-derived base raster, each copy
    // brightness-shifted by doc_id % 3 (+0..2 on every byte — hex-char
    // bytes 48..102 never saturate). Spark decodes the PERTURBED P6
    // through the real parser and dHashes it; DuckDB dHashes the BASE
    // raster arithmetically — equal group hashes prove the fingerprint's
    // brightness invariance held through the real decode on every image,
    // and that grouping by it recovers exactly the planted dup groups.
    q(
      "mm_dhash_dedup",
      """WITH m AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id % 100 AS VARCHAR) || '-0') || md5(CAST(doc_id % 100 AS VARCHAR) || '-1') ||
        |    md5(CAST(doc_id % 100 AS VARCHAR) || '-2') || md5(CAST(doc_id % 100 AS VARCHAR) || '-3') ||
        |    md5(CAST(doc_id % 100 AS VARCHAR) || '-4') || md5(CAST(doc_id % 100 AS VARCHAR) || '-5') AS ras
        |  FROM documents
        |), gr AS (
        |  SELECT doc_id, (p // 8) AS y, (p % 8) AS x,
        |    ord(substr(ras, CAST((p * 3) + 1 AS INT), 1)) +
        |    ord(substr(ras, CAST((p * 3) + 2 AS INT), 1)) +
        |    ord(substr(ras, CAST((p * 3) + 3 AS INT), 1)) AS g
        |  FROM m, UNNEST(GENERATE_SERIES(0, 63)) AS t(p)
        |), bits AS (
        |  SELECT a.doc_id,
        |    CAST(SUM(CASE WHEN b.g > a.g
        |      THEN (CAST(1 AS BIGINT) << (a.y * 7 + a.x)) ELSE 0 END) AS BIGINT) AS dh
        |  FROM gr a JOIN gr b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
        |  WHERE a.x < 7
        |  GROUP BY 1
        |)
        |SELECT dh AS dhash, COUNT(*) AS n_dups, MIN(doc_id) AS first_id,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM bits GROUP BY 1 HAVING COUNT(*) >= 2""".stripMargin
    ) { (s, dir) =>
      val docs = tDocs(s, dir)
      val header = lit("P6\n8 8\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val seedS = (col("doc_id") % 100).cast("string")
      val base = concat((0 to 5).map(k =>
        md5(concat(seedS, lit(s"-$k")))): _*)
      val shift = (col("doc_id") % 3).cast("int")
      val pert = array_join(transform(
        filter(split(base, ""), c => c =!= ""),
        c => call_function("chr", ascii(c) + shift)), "")
      val media = docs.select(col("doc_id").cast("long").as("media_id"),
        concat(header, pert.cast("binary")).as("payload"))
      MultimodalOps.imageDHash(media)
        .groupBy("dhash")
        .agg(count(lit(1)).as("n_dups"),
          min("media_id").as("first_id"),
          sum("media_id").as("id_sum"))
        .filter(col("n_dups") >= 2)
        .orderBy("dhash")
    },

    // ---- NEAR-MISS image dedup under the oracle: the copies exact
    // dhash grouping loses. Same md5 base rasters (doc_id % 100 groups),
    // each copy brightness-shifted by v = doc_id % 3 (the invariance)
    // AND with v ∈ {1,2} pixels forced to zero — pixel (0,0) for v≥1,
    // plus (0,4) for v=2 — which flips up to one dhash comparison each,
    // the 1–2-bit damage a recompression artifact does. Spark decodes
    // the perturbed P6 payloads for real and pairs fingerprints through
    // the BANDED hamming join (4×16-bit pigeonhole candidates, exact
    // bit_count verify — never a cartesian pass, PlanQualitySpec);
    // DuckDB computes every modified hash arithmetically from the
    // UNSHIFTED bytes and brute-forces all pairs. Equal hashes prove
    // the banding is complete at maxDist=3, the verify exact, and the
    // invariance + near-miss pairing compose through the real codec.
    q(
      "mm_dhash_near",
      """WITH m AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id % 100 AS VARCHAR) || '-0') || md5(CAST(doc_id % 100 AS VARCHAR) || '-1') ||
        |    md5(CAST(doc_id % 100 AS VARCHAR) || '-2') || md5(CAST(doc_id % 100 AS VARCHAR) || '-3') ||
        |    md5(CAST(doc_id % 100 AS VARCHAR) || '-4') || md5(CAST(doc_id % 100 AS VARCHAR) || '-5') AS ras
        |  FROM documents
        |), gr AS (
        |  SELECT doc_id, (p // 8) AS y, (p % 8) AS x,
        |    CASE WHEN (doc_id % 3 >= 1 AND p = 0) OR (doc_id % 3 = 2 AND p = 32)
        |      THEN 0
        |      ELSE ord(substr(ras, CAST((p * 3) + 1 AS INT), 1)) +
        |           ord(substr(ras, CAST((p * 3) + 2 AS INT), 1)) +
        |           ord(substr(ras, CAST((p * 3) + 3 AS INT), 1)) END AS g
        |  FROM m, UNNEST(GENERATE_SERIES(0, 63)) AS t(p)
        |), bits AS (
        |  SELECT a.doc_id,
        |    CAST(SUM(CASE WHEN b.g > a.g
        |      THEN (CAST(1 AS BIGINT) << (a.y * 7 + a.x)) ELSE 0 END) AS BIGINT) AS dh
        |  FROM gr a JOIN gr b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
        |  WHERE a.x < 7
        |  GROUP BY 1
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
        |FROM bits a JOIN bits b ON b.doc_id > a.doc_id
        |WHERE bit_count(xor(a.dh, b.dh)) <= 3""".stripMargin
    ) { (s, dir) =>
      val docs = tDocs(s, dir)
      val header = lit("P6\n8 8\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val seedS = (col("doc_id") % 100).cast("string")
      val base = concat((0 to 5).map(k =>
        md5(concat(seedS, lit(s"-$k")))): _*)
      val shift = (col("doc_id") % 3).cast("int")
      val pert = array_join(transform(
        filter(split(base, ""), c => c =!= ""),
        c => call_function("chr", ascii(c) + shift)), "")
      val v = col("doc_id") % 3
      val z3 = lit(Array[Byte](0, 0, 0))
      val ras0 = pert.cast("binary")
      // forced-zero pixels: (0,0) at raster offset 0 (overlay pos 1),
      // (0,4) at offset (4·8+0)·3 = 96 (pos 97); gray 0 sits below any
      // hex-char pixel, so each flip forces one known comparison
      val ras = when(v === 1, overlay(ras0, z3, lit(1)))
        .when(v === 2, overlay(overlay(ras0, z3, lit(1)), z3, lit(97)))
        .otherwise(ras0)
      val media = docs.select(col("doc_id").cast("long").as("media_id"),
        concat(header, ras).as("payload"))
      MultimodalOps.imageNearDups(
        MultimodalOps.imageDHash(media), maxDist = 3)
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    },

    // ---- Perceptual AUDIO dedup (envelope hash) under the oracle — the
    // WAV sibling of mm_dhash_dedup: docs sharing doc_id % 100 get the
    // same integer-recurrence clip at a volume scaled by doc_id % 3.
    // Spark routes the SCALED samples through the real RIFF encoder and
    // parser and hashes adjacent-frame loudness comparisons; DuckDB
    // hashes the UNSCALED recurrence arithmetically — equal group
    // hashes prove volume invariance through the real codec and exact
    // recovery of the planted groups.
    q(
      "mm_ahash_dedup",
      """WITH g AS (
        |  SELECT doc_id, (k // 8) AS f,
        |    ABS(((doc_id % 100) * 31 + k) * ((doc_id % 100) * 7 + k + 1)
        |        % 16001 - 8000) AS a
        |  FROM documents, UNNEST(GENERATE_SERIES(0, 255)) AS t(k)
        |), e AS (
        |  SELECT doc_id, f, CAST(SUM(a) AS BIGINT) AS en FROM g GROUP BY 1, 2
        |), bits AS (
        |  SELECT a.doc_id,
        |    CAST(SUM(CASE WHEN b.en > a.en
        |      THEN (CAST(1 AS BIGINT) << a.f) ELSE 0 END) AS BIGINT) AS ah
        |  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.f = a.f + 1
        |  GROUP BY 1
        |)
        |SELECT ah AS ahash, COUNT(*) AS n_dups, MIN(doc_id) AS first_id,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM bits GROUP BY 1 HAVING COUNT(*) >= 2""".stripMargin
    ) { (s, dir) =>
      val media = MultimodalOps.wavNearDupTable(tDocs(s, dir), seedMod = 100)
      MultimodalOps.audioEnvelopeHash(media)
        .groupBy("ahash")
        .agg(count(lit(1)).as("n_dups"),
          min("media_id").as("first_id"),
          sum("media_id").as("id_sum"))
        .filter(col("n_dups") >= 2)
        .orderBy("ahash")
    },

    // ---- CLIP near-dup from frame fingerprints under the oracle — the
    // video modality's dedup: every doc is an 8-frame concatenated-P6
    // clip whose content frames slide over a shared pool (start =
    // doc_id % 50, so nearby starts overlap 6-7 frames) behind a
    // common intro-card frame in EVERY clip. Spark walks the stream
    // with the real parser, dHashes each frame, drops boilerplate by
    // document frequency (the intro card — without maxDf it would pair
    // all 500 clips quadratically), and pairs clips sharing ≥ 6
    // fingerprints; DuckDB re-derives every frame hash arithmetically
    // and runs the same bag-of-frames join. Equal hashes pin the frame
    // walker, the per-frame fingerprints, the boilerplate guard and
    // the containment threshold at once.
    q(
      "mm_vdup_pairs",
      """WITH fr AS (
        |  SELECT doc_id, j,
        |    CASE WHEN j = 0 THEN 9999 ELSE doc_id % 50 + j END AS p
        |  FROM documents, UNNEST(GENERATE_SERIES(0, 7)) AS t(j)
        |), m AS (
        |  SELECT doc_id, j,
        |    md5(CAST(p AS VARCHAR) || '-0') || md5(CAST(p AS VARCHAR) || '-1') ||
        |    md5(CAST(p AS VARCHAR) || '-2') || md5(CAST(p AS VARCHAR) || '-3') ||
        |    md5(CAST(p AS VARCHAR) || '-4') || md5(CAST(p AS VARCHAR) || '-5') AS ras
        |  FROM fr
        |), gr AS (
        |  SELECT doc_id, j, (q // 8) AS y, (q % 8) AS x,
        |    ord(substr(ras, CAST((q * 3) + 1 AS INT), 1)) +
        |    ord(substr(ras, CAST((q * 3) + 2 AS INT), 1)) +
        |    ord(substr(ras, CAST((q * 3) + 3 AS INT), 1)) AS g
        |  FROM m, UNNEST(GENERATE_SERIES(0, 63)) AS t(q)
        |), bits AS (
        |  SELECT a.doc_id, a.j,
        |    CAST(SUM(CASE WHEN b.g > a.g
        |      THEN (CAST(1 AS BIGINT) << (a.y * 7 + a.x)) ELSE 0 END) AS BIGINT) AS dh
        |  FROM gr a JOIN gr b ON b.doc_id = a.doc_id AND b.j = a.j
        |    AND b.y = a.y AND b.x = a.x + 1
        |  WHERE a.x < 7 GROUP BY 1, 2
        |), fh AS (SELECT DISTINCT doc_id, dh FROM bits
        |), keep AS (SELECT dh FROM fh GROUP BY 1 HAVING COUNT(*) <= 100
        |), kk AS (SELECT fh.doc_id, fh.dh FROM fh JOIN keep USING (dh))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        |FROM kk a JOIN kk b ON a.dh = b.dh AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 6""".stripMargin
    ) { (s, dir) =>
      val header = lit("P6\n8 8\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      def ras(p: org.apache.spark.sql.Column) = concat((0 to 5).map(k =>
        md5(concat(p.cast("string"), lit(s"-$k")))): _*).cast("binary")
      val frames = (0 to 7).map { j =>
        val p: org.apache.spark.sql.Column =
          if (j == 0) lit(9999) else pmod(col("doc_id"), lit(50)) + lit(j)
        concat(header, ras(p))
      }
      val media = tDocs(s, dir)
        .select(col("doc_id").cast("long").as("media_id"),
          concat(frames: _*).as("payload"))
      MultimodalOps.clipNearDups(
        MultimodalOps.clipFrameHashes(media), minShared = 6, maxDf = 100)
        .orderBy("id_a", "id_b")
    },

    // ---- PNG encode→decode round-trip under the oracle: the md5-derived
    // 8×8 raster goes PPM-parse → REAL JDK PNG writer → REAL JDK PNG
    // reader; the decoded raster's channel sums and position-weighted
    // checksum must equal DuckDB's arithmetic over the SOURCE raster —
    // PNG is lossless, so equal hashes prove the whole encode→decode
    // identity per byte per row (the JPEG path, being lossy, is
    // value-pinned in JvmMediaCodecSpec instead).
    q(
      "mm_png_roundtrip",
      """WITH m AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || '-0') || md5(CAST(doc_id AS VARCHAR) || '-1') ||
        |    md5(CAST(doc_id AS VARCHAR) || '-2') || md5(CAST(doc_id AS VARCHAR) || '-3') ||
        |    md5(CAST(doc_id AS VARCHAR) || '-4') || md5(CAST(doc_id AS VARCHAR) || '-5') AS ras
        |  FROM documents
        |), u AS (
        |  SELECT doc_id, ras, UNNEST(GENERATE_SERIES(1, 192)) AS i FROM m
        |), x AS (
        |  SELECT doc_id, i, ord(substr(ras, CAST(i AS INT), 1)) AS b FROM u
        |)
        |SELECT doc_id AS media_id,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  CAST(SUM(CASE WHEN (i-1) % 3 = 0 THEN b ELSE 0 END) AS BIGINT) AS sum_r,
        |  CAST(SUM(CASE WHEN (i-1) % 3 = 1 THEN b ELSE 0 END) AS BIGINT) AS sum_g,
        |  CAST(SUM(CASE WHEN (i-1) % 3 = 2 THEN b ELSE 0 END) AS BIGINT) AS sum_b,
        |  CAST(SUM(b * ((i-1) % 7 + 1)) AS BIGINT) AS chk
        |FROM x GROUP BY doc_id""".stripMargin
    ) { (s, dir) =>
      MultimodalOps.pngRoundTripStats(ppmMediaTable(tDocs(s, dir)))
    },

    // ---- WAV container round-trip under the oracle: both engines derive
    // the same PCM16 samples from pure integer arithmetic; Spark routes
    // them through the REAL RIFF encoder and parser and reports stats
    // over the DECODED samples (position-weighted checksum — a dropped,
    // reordered, or sign-flipped sample can't cancel); DuckDB computes
    // the same stats from the formula directly. Equal hashes prove the
    // encode→decode identity on every sample of every row.
    q(
      "mm_wav_roundtrip",
      """WITH g AS (
        |  SELECT doc_id,
        |    UNNEST(GENERATE_SERIES(0, CAST(63 + doc_id % 64 AS INT))) AS k
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, k,
        |    ((doc_id * 31 + k) * 131071) % 65536 - 32768 AS v
        |  FROM g
        |)
        |SELECT doc_id AS media_id,
        |  CAST(64 + doc_id % 64 AS BIGINT) AS n_samples,
        |  CAST(16000 AS BIGINT) AS sample_rate,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        |  CAST(SUM(v * (k % 7 + 1)) AS BIGINT) AS chk
        |FROM s GROUP BY doc_id""".stripMargin
    ) { (s, dir) =>
      MultimodalOps.wavRoundTripStats(tDocs(s, dir))
    },

    // ---- HLL sketch under the oracle, self-check pattern: exact
    // COUNT(DISTINCT) is the 100 TB anti-pattern this sketch replaces
    // (every distinct value shuffles; HLL ships fixed 2^p-byte registers
    // through partial agg). The sketch estimate itself is engine-specific,
    // so the gate compares the exact count PLUS the bound claim
    // |approx − exact| ≤ 5 %·exact as a column: DuckDB asserts TRUE
    // literally, Spark computes it — a sketch drifting out of tolerance
    // flips the hash and fails the gate. HLL++ register merge is
    // max-commutative, so the Spark value is partitioning-independent.
    // ---- Misra-Gries heavy hitters under the oracle, same self-check
    // pattern as ev_hll_users: the skewed key (two 20%-hot buckets + a
    // long uniform tail — modulo-derived, so the skew is scale-invariant
    // across SFs) is derived identically in both engines, the exact
    // counts of the TRUE heavies (freq > n/(k+1)) are hash-compared, and
    // the sketch's paper guarantee — found, undercount ≤ n/(k+1) — rides
    // along as a claim column DuckDB asserts literally TRUE. The raw MG
    // counters are merge-order-dependent and never leave the op; the
    // bound is what scale users rely on and what the gate checks.
    q(
      "ev_heavy_hitters",
      """WITH keyed AS (
        |  SELECT CASE WHEN user_id % 5 = 0 THEN 'hot_a'
        |              WHEN user_id % 5 = 1 THEN 'hot_b'
        |              ELSE CAST(user_id AS VARCHAR) END AS key
        |  FROM events
        |), tot AS (SELECT COUNT(*) AS n FROM keyed)
        |SELECT key, COUNT(*) AS exact_n, TRUE AS within_bound
        |FROM keyed, tot GROUP BY key, n HAVING COUNT(*) * 10 > n""".stripMargin
    ) { (s, dir) =>
      graft.ops.SketchOps.heavyHittersChecked(
        tEvents(s, dir),
        when(col("user_id") % 5 === 0, "hot_a")
          .when(col("user_id") % 5 === 1, "hot_b")
          .otherwise(col("user_id").cast("string")),
        k = 9)
    },

    // ---- Grid resampling with forward-fill: align each event type to
    // an hourly grid, each grid point carrying the latest event at or
    // before it — the time-series alignment shape (sensor downsampling,
    // market snapshots), composed directly from AsofJoinOps against a
    // GENERATED left side (the grid is 720·|types| rows — never
    // data-sized). Grid points before the first event stay null
    // (left-outer). Oracle: DuckDB's native ASOF LEFT JOIN again —
    // independent engine, same semantics.
    q(
      "ev_gridfill",
      """WITH g AS (
        |  SELECT t.event_type,
        |    make_timestamp(1704067200000000 + 3600000000 * s.i) AS gts
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |    GENERATE_SERIES(0, 719) s(i)
        |)
        |SELECT g.event_type, epoch_us(g.gts) AS grid_us,
        |  e.event_id AS last_event_id, epoch_us(e.ts) AS last_ts_us
        |FROM g ASOF LEFT JOIN events e
        |  ON g.event_type = e.event_type AND g.gts >= e.ts""".stripMargin
    ) { (s, dir) =>
      val types = tEvents(s, dir).select("event_type").distinct()
      val grid = types.crossJoin(
          s.range(0, 720).select(expr(
            "timestamp_micros(1704067200000000 + 3600000000 * id)").as("gts")))
      graft.ops.AsofJoinOps.asofJoin(
          grid, tEvents(s, dir).select("event_id", "event_type", "ts"),
          Seq("event_type"), "gts", "ts",
          rightPayload = Seq("event_id"), rightPrefix = "last_")
        .select(col("event_type"),
          unix_micros(col("gts")).as("grid_us"),
          col("last_event_id"), col("last_ts_us"))
    },

    // ---- SCD2 (slowly-changing-dimension) intervals from a change
    // log: each event opens a validity window closed by the user's next
    // event (null = current). One keyed window (lead over user_id —
    // scalable); the oracle is the independent correlated-min
    // formulation, not the same lead.
    q(
      "ev_scd2",
      """SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
        |  (SELECT MIN(epoch_us(e2.ts)) FROM events e2
        |   WHERE e2.user_id = e.user_id AND e2.ts > e.ts) AS valid_to_us,
        |  (SELECT MIN(e2.ts) FROM events e2
        |   WHERE e2.user_id = e.user_id AND e2.ts > e.ts) IS NULL
        |  AS is_current
        |FROM events e""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // min over a STRICTLY-LATER range frame, not lead(1): on duplicate
      // (user_id, ts) rows lead gives one twin the other's identical ts
      // and the later ts to an arbitrary one — nondeterministic and
      // divergent from the oracle's correlated strictly-greater MIN,
      // which closes BOTH twins at the same next ts
      val w = Window.partitionBy("user_id").orderBy("valid_from_us")
        .rangeBetween(1, Window.unboundedFollowing)
      tEvents(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("valid_from_us"))
        .withColumn("valid_to_us", min(col("valid_from_us")).over(w))
        .withColumn("is_current", col("valid_to_us").isNull)
    },

    // ---- Cohort retention: users grouped by first-seen week, counted
    // distinct in each subsequent week-offset — all time math in integer
    // epoch days/weeks (floor division), so the matrix hash-compares
    // exactly. Two aggregations + one user-keyed join; the matrix is
    // |cohorts|×|offsets| rows regardless of event volume.
    q(
      "ev_retention",
      """WITH d AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), f AS (
        |  SELECT user_id, MIN(day) AS first_day FROM d GROUP BY 1
        |)
        |SELECT f.first_day // 7 AS cohort_week,
        |  (d.day - f.first_day) // 7 AS week_offset,
        |  COUNT(DISTINCT d.user_id) AS n_users
        |FROM d JOIN f ON f.user_id = d.user_id
        |GROUP BY 1, 2""".stripMargin
    ) { (s, dir) =>
      val d = tEvents(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
      val f = d.groupBy("user_id").agg(min("day").as("first_day"))
      d.join(f, "user_id")
        .groupBy(expr("first_day div 7").as("cohort_week"),
          expr("(day - first_day) div 7").as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
    },

    // ---- Time-bounded funnel (view→click→purchase, each step ≤ 2 h
    // after the previous): sequential pattern matching as ONE windowed
    // scan per user (EventOps.funnelCounts — running-max preceding
    // view/qualifying-click, no self-join); the oracle is the
    // independent triple exists-join formulation. Stage counts are
    // genuinely selective at the 2 h bound (150 / 64 / 1 at sf0.01).
    q(
      "ev_funnel",
      """WITH s1 AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'view'),
        |s2 AS (SELECT DISTINCT c.user_id FROM events c JOIN events v
        |  ON v.user_id = c.user_id AND v.event_type = 'view'
        |  AND c.event_type = 'click' AND v.ts < c.ts
        |  AND epoch_us(c.ts) - epoch_us(v.ts) <= 7200000000),
        |s3 AS (SELECT DISTINCT p.user_id FROM events p
        |  JOIN events c ON c.user_id = p.user_id AND c.event_type = 'click'
        |    AND p.event_type = 'purchase' AND c.ts < p.ts
        |    AND epoch_us(p.ts) - epoch_us(c.ts) <= 7200000000
        |  JOIN events v ON v.user_id = c.user_id AND v.event_type = 'view'
        |    AND v.ts < c.ts
        |    AND epoch_us(c.ts) - epoch_us(v.ts) <= 7200000000)
        |SELECT (SELECT COUNT(*) FROM s1) AS n_view,
        |  (SELECT COUNT(*) FROM s2) AS n_view_click,
        |  (SELECT COUNT(*) FROM s3) AS n_view_click_purchase""".stripMargin
    ) { (s, dir) =>
      graft.streaming.EventOps.funnelCounts(tEvents(s, dir), boundMinutes = 120)
    },

    // ---- Count-Min point-frequency sketch, same self-check pattern:
    // exact per-key counts are the hash-compared part; the sketch's two
    // guarantees ride as claim columns DuckDB asserts literally TRUE.
    // ge_exact is deterministic (CMS never undercounts); within_eps is
    // the (e/w)·n paper bound — and because CMS counters are plain sums,
    // the merged sketch is partitioning-invariant, so both claims are
    // exactly reproducible run-to-run (verified at sf0.001/0.01/0.1).
    // w=16384 keeps the bound honest even at sf0.1's key density.
    q(
      "ev_cms",
      """SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS exact_n,
        |  TRUE AS ge_exact, TRUE AS within_eps
        |FROM events GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      graft.ops.SketchOps.cmsChecked(
        tEvents(s, dir), col("user_id"), d = 4, w = 16384)
    },

    // ---- CMS as a PERSISTED, INCREMENTALLY-FOLDED store: counter rows
    // are plain sums, so (unlike HLL, whose register-union rewrite was
    // removed as unsound) the incrementally-built sketch equals the
    // one-shot sketch EXACTLY — asserted here as a claim column through
    // the real store lifecycle (80% build → 20% merge → serve), against
    // a one-shot store built through the same API. Point estimates for
    // any key read ≤ d stored rows; the store is bounded by d·w rows
    // no matter the corpus. Exact counts are the hash-compared part;
    // ge_exact / within_eps are the paper guarantees.
    q(
      "ev_cms_store",
      """SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS exact_n,
        |  TRUE AS ge_exact, TRUE AS within_eps, TRUE AS store_eq_oneshot
        |FROM events GROUP BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.ops.IncrementalAggOps
      val ev = tEvents(s, dir)
      val (d, w) = (4, 16384)
      val baseInc = scratchDir("graft-cms-inc")
      val baseOne = scratchDir("graft-cms-one")
      // gate-fixture buckets (8): per-bucket writer init dominates a
      // 3-store-write query at sf scale (the dedup_incremental lesson);
      // results are bucket-count-independent
      IncrementalAggOps.writeCmsStore(
        ev.filter(pmod(col("event_id"), lit(5)) =!= 0), s, baseInc,
        Nil, "user_id", d, w, nBuckets = 8)
      IncrementalAggOps.mergeIntoCmsStore(
        ev.filter(pmod(col("event_id"), lit(5)) === 0), s, baseInc,
        Nil, "user_id", d, w, nBuckets = 8)
      IncrementalAggOps.writeCmsStore(ev, s, baseOne, Nil, "user_id", d, w,
        nBuckets = 8)
      val cand = ev.select("user_id")
      val est = IncrementalAggOps.cmsEstimateFromStore(
        cand, s, baseInc, Nil, "user_id", d, w)
      val one = IncrementalAggOps.cmsEstimateFromStore(
        cand, s, baseOne, Nil, "user_id", d, w)
        .withColumnRenamed("est_n", "one_n")
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      val n = ev.count()
      val eps = math.ceil(n * math.E / w).toLong
      est.join(one, "user_id").join(exact, "user_id")
        .select(col("user_id").cast("string").as("key"),
          col("exact_n"),
          (col("est_n") >= col("exact_n")).as("ge_exact"),
          (col("est_n") <= col("exact_n") + lit(eps)).as("within_eps"),
          (col("est_n") === col("one_n")).as("store_eq_oneshot"))
    },

    // ---- Heavy hitters PER GROUP: one MG summary per event type (the
    // sketch rides the partial-agg tree per group — state is k·|groups|
    // counters). Same hot-key derivation as ev_heavy_hitters so true
    // heavies exist inside each group; exact counts hash-compared, the
    // within-group bound as the claim column.
    q(
      "ev_heavy_per_type",
      """WITH keyed AS (
        |  SELECT event_type AS grp,
        |    CASE WHEN user_id % 5 = 0 THEN 'hot_a'
        |         WHEN user_id % 5 = 1 THEN 'hot_b'
        |         ELSE CAST(user_id AS VARCHAR) END AS key
        |  FROM events
        |), tot AS (SELECT grp, COUNT(*) AS n FROM keyed GROUP BY 1)
        |SELECT k.grp, k.key, COUNT(*) AS exact_n, TRUE AS within_bound
        |FROM keyed k JOIN tot t ON t.grp = k.grp
        |GROUP BY k.grp, k.key, t.n HAVING COUNT(*) * 10 > t.n""".stripMargin
    ) { (s, dir) =>
      graft.ops.SketchOps.heavyHittersPerGroupChecked(
        tEvents(s, dir), col("event_type"),
        when(col("user_id") % 5 === 0, "hot_a")
          .when(col("user_id") % 5 === 1, "hot_b")
          .otherwise(col("user_id").cast("string")),
        k = 9)
    },

    // ---- Join-size estimation from two CMS sketches (inner product —
    // the optimizer's cardinality-estimation primitive): exact join
    // count hash-compared, the sketch's no-undercount guarantee and
    // (e/w)·n1·n2 bound as claim columns (verified sf0.001/0.01/0.1;
    // deterministic thereafter — CMS is partitioning-invariant).
    q(
      "ev_join_size",
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events
        |  WHERE event_type = 'purchase')
        |SELECT (SELECT COUNT(*) FROM c JOIN p USING (key)) AS exact_n,
        |  TRUE AS ge_exact, TRUE AS within_eps""".stripMargin
    ) { (s, dir) =>
      val ev = tEvents(s, dir)
      graft.ops.SketchOps.cmsJoinSizeChecked(
        ev.filter(col("event_type") === "click"), col("user_id"),
        ev.filter(col("event_type") === "purchase"), col("user_id"),
        d = 4, w = 16384)
    },

    q(
      "ev_hll_users",
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  TRUE AS within_5pct
        |FROM events GROUP BY event_type""".stripMargin
    ) { (s, dir) =>
      tEvents(s, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          approx_count_distinct(col("user_id"), 0.02).as("__approx"))
        .select(col("event_type"), col("n_users"),
          (abs(col("__approx") - col("n_users"))
            <= col("n_users") * lit(0.05)).as("within_5pct"))
    },

    // ---- PERSISTED mergeable-sketch rollup store, same self-check
    // pattern as ev_hll_users but through DISK: per-(event_type, day)
    // DataSketches HLL blobs are written for the historical days, the
    // remaining days APPENDED as a second ingest batch (the store is
    // never rewritten — the incremental-ingest contract every rollup
    // table needs), then the per-type distinct-user query runs by
    // UNIONING the persisted registers — no raw-event re-scan, cost ∝
    // store cells. The gate hash-compares the exact counts and asserts
    // the merged-store estimate lands within 5% — a store that dropped a
    // batch, double-merged a cell, or corrupted a blob flips the claim.
    q(
      "ev_hll_store",
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  TRUE AS store_within_5pct
        |FROM events GROUP BY event_type""".stripMargin
    ) { (s, dir) =>
      val ev = tEvents(s, dir)
        .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      val store = scratchDir("graft-hllstore")
      graft.ops.SketchOps.writeHllStore(
        ev.filter(col("day") % 3 =!= 0), store,
        Seq("event_type", "day"), col("user_id"))
      graft.ops.SketchOps.writeHllStore(
        ev.filter(col("day") % 3 === 0), store,
        Seq("event_type", "day"), col("user_id"), append = true)
      val approx = graft.ops.SketchOps.readHllStore(s, store, Seq("event_type"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"))
      exact.join(approx, "event_type")
        .select(col("event_type"), col("n_users"),
          (abs(col("approx_distinct") - col("n_users"))
            <= col("n_users") * lit(0.05)).as("store_within_5pct"))
    }
  )
}
