package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsDF = graft.queries.tEvents(spark, sfTiny)

  private def toEvents = eventsDF
    .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    .as[EventOps.Event]

  test("windowed agg over a MemoryStream matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventOps.Event]
    val streamed = EventOps.windowedAggStream(input.toDF(), "1 hour", "2 hours")
    val q = streamed.writeStream
      .format("memory").queryName("win_agg").outputMode("append").start()
    try {
      val all = toEvents.collect().sortBy(_.ts.getTime)
      input.addData(all.toIndexedSeq)
      q.processAllAvailable()
      // append mode holds back windows newer than the watermark; advance it
      // past everything with a far-future event, then drop that event's window
      val flush = EventOps.Event(-1L,
        new java.sql.Timestamp(all.last.ts.getTime + 7L * 24 * 3600 * 1000),
        0L, "flush", 0.0)
      input.addData(flush)
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .filter($"event_type" =!= "flush")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val want = EventOps.windowedAgg(eventsDF, "1 hour").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(got.keySet == want.keySet)
      want.foreach { case (k, (n, tot)) =>
        val (gn, gtot) = got(k)
        assert(gn == n && math.abs(gtot - tot) < 1e-6, s"window $k")
      }
    } finally q.stop()
  }

  test("streaming transitions equal the batch matrix across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventOps.Event]
    val q = EventOps.transitionsStream(input.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      val all = toEvents.collect().sortBy(e => (e.ts.getTime, e.event_id))
      // two chunks: cross-trigger pairs must come from the kept state
      val (a, b) = all.splitAt(all.length / 2)
      input.addData(a.toIndexedSeq); q.processAllAvailable()
      input.addData(b.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("transitions")
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = EventOps.transitionsBatch(eventsDF).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want, s"stream/batch transition counts diverge")
      assert(got.values.sum > 0)
    } finally q.stop()
  }

  test("streaming sessionization closes the same sessions as batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventOps.Event]
    val q = EventOps.sessionizeStream(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      val all = toEvents.collect().sortBy(_.ts.getTime)
      // feed in two chunks to exercise cross-trigger state
      val (a, b) = all.splitAt(all.length / 2)
      input.addData(a.toIndexedSeq); q.processAllAvailable()
      input.addData(b.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("sessions")
        .select("user_id", "start_us", "end_us", "n_events", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = EventOps.sessionizeBatch(eventsDF)
        .select("user_id", "start_us", "end_us", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // stream emits only CLOSED sessions (no timeout): batch minus each
      // user's final session
      val lastPerUser = batch.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      val expectedClosed = batch.filterNot(s => lastPerUser(s._1) == s).toSet
      assert(got == expectedClosed)
    } finally q.stop()
  }

  test("pre-epoch timestamps: stream sessionization agrees with unix_micros") {
    // regression for the floorDiv fix: ts.getTime is NEGATIVE before 1970
    // and `/` truncates toward zero, which placed pre-epoch events one
    // second late vs the batch side's unix_micros/date_trunc alignment.
    // Sessions spanning the epoch must carry the exact batch start/end.
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val evs = Seq(
      EventOps.Event(1L, ts("1969-12-31 23:40:00.25"), 7L, "a", 1.0),
      EventOps.Event(2L, ts("1969-12-31 23:55:30.5"), 7L, "a", 2.0),
      EventOps.Event(3L, ts("1970-01-01 00:10:00.75"), 7L, "a", 3.0),
      // > 30 min gap closes the session; this event opens the next one
      EventOps.Event(4L, ts("1970-01-01 01:00:01"), 7L, "a", 4.0))
    val input = MemoryStream[EventOps.Event]
    val q = EventOps.sessionizeStream(input.toDS())
      .writeStream.format("memory").queryName("preepoch_sessions")
      .outputMode("append").start()
    try {
      input.addData(evs); q.processAllAvailable()
      val got = spark.table("preepoch_sessions")
        .select("user_id", "start_us", "end_us", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = EventOps.sessionizeBatch(evs.toDF())
        .select("user_id", "start_us", "end_us", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // stream emits closed sessions only: the first (epoch-spanning) one
      val lastStart = batch.map(_._2).max
      val expectedClosed = batch.filterNot(_._2 == lastStart).toSet
      assert(got == expectedClosed)
      // the exercised session genuinely starts at NEGATIVE epoch micros
      // (the exactness itself is the set equality above: batch bounds come
      // from unix_micros, which always floors)
      assert(got.head._2 < 0L, s"expected a pre-epoch session, got ${got.head._2}")
    } finally q.stop()
  }

  test("evicting sessionization flushes EVERY batch session once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventOps.Event]
    val q = EventOps.sessionizeStreamEvicting(input.toDS(), watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions_evict")
      .outputMode("append").start()
    try {
      val all = toEvents.collect().sortBy(_.ts.getTime)
      val (a, b) = all.splitAt(all.length / 2)
      input.addData(a.toIndexedSeq); q.processAllAvailable()
      input.addData(b.toIndexedSeq); q.processAllAvailable()
      // push the watermark past every open session's gap horizon so the
      // event-time timeouts fire and final sessions flush
      val flush = EventOps.Event(-1L,
        new java.sql.Timestamp(all.last.ts.getTime + 7L * 24 * 3600 * 1000),
        -1L, "flush", 0.0)
      input.addData(flush); q.processAllAvailable()
      input.addData(flush.copy(event_id = -2L)); q.processAllAvailable()
      val got = spark.table("sessions_evict")
        .filter($"user_id" >= 0)
        .select("user_id", "start_us", "end_us", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = EventOps.sessionizeBatch(eventsDF)
        .select("user_id", "start_us", "end_us", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want) // ALL sessions, including each user's final one
    } finally q.stop()
  }

  test("evicting sessionization under the RocksDB state store: same sessions") {
    // the cluster-scale state backend: flatMapGroupsWithState state in
    // RocksDB (native memory + local disk) instead of the executor heap.
    // Results must be identical to the default provider / the batch form,
    // and the progress metrics must prove RocksDB actually served the
    // state (a silently ignored conf would pass the parity check).
    implicit val sqlCtx = spark.sqlContext
    EventOps.withRocksDBStateStore(spark) {
      val input = MemoryStream[EventOps.Event]
      val q = EventOps.sessionizeStreamEvicting(input.toDS(), watermark = "1 minute")
        .writeStream.format("memory").queryName("sessions_rocks")
        .outputMode("append").start()
      try {
        val all = toEvents.collect().sortBy(_.ts.getTime)
        val (a, b) = all.splitAt(all.length / 2)
        input.addData(a.toIndexedSeq); q.processAllAvailable()
        input.addData(b.toIndexedSeq); q.processAllAvailable()
        val flush = EventOps.Event(-1L,
          new java.sql.Timestamp(all.last.ts.getTime + 7L * 24 * 3600 * 1000),
          -1L, "flush", 0.0)
        input.addData(flush); q.processAllAvailable()
        input.addData(flush.copy(event_id = -2L)); q.processAllAvailable()
        val got = spark.table("sessions_rocks")
          .filter($"user_id" >= 0)
          .select("user_id", "start_us", "end_us", "n_events")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        val want = EventOps.sessionizeBatch(eventsDF)
          .select("user_id", "start_us", "end_us", "n_events")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got == want)
        import scala.jdk.CollectionConverters._
        val rocksMetrics = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .flatMap(_.customMetrics.keySet.asScala)
          .filter(_.toLowerCase.contains("rocksdb"))
        assert(rocksMetrics.nonEmpty,
          "no rocksdb state metrics: the provider conf was not picked up")
      } finally q.stop()
    }
    // the toggle restored the previous provider setting
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .contains(EventOps.RocksDBProvider))
  }

  test("streaming dedup-on-ingest keeps the same firsts as the batch form") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventOps.Event]
    // watermark wider than the dataset's whole time span: within-watermark
    // dedup then equals global dedup, so the batch form is the oracle
    // (with the production-default 2 h horizon, duplicate pairs separated
    // by more than 2 h of EVENT time are correctly re-admitted)
    val q = EventOps.dedupStream(input.toDF(), Seq("event_type", "value"),
        watermark = "365 days")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      // feed in event_id order, in two chunks, so "first arrival" (what
      // the stream keeps) coincides with "lowest event_id" (what the
      // batch form reports)
      val all = toEvents.collect().sortBy(_.event_id)
      val (a, b) = all.splitAt(all.length / 2)
      input.addData(a.toIndexedSeq); q.processAllAvailable()
      input.addData(b.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("dedup")
        .select("event_id").collect().map(_.getLong(0)).toSet
      val want = EventOps.dedupBatch(eventsDF, Seq("event_type", "value"))
        .select("first_id").collect().map(_.getLong(0)).toSet
      assert(got == want)
      // and the keyspace is genuinely smaller than the input
      assert(got.size < all.length)
    } finally q.stop()
  }

  test("streaming spike detection matches the batch ev_spike pairs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventOps.Event]
    val q = EventOps.spikeStream(input.toDS())
      .writeStream.format("memory").queryName("spikes")
      .outputMode("append").start()
    try {
      val all = toEvents.collect().sortBy(_.ts.getTime)
      // three UNEVEN chunks so window boundaries straddle triggers and the
      // open-window counts must survive and merge across state updates
      val (a, rest) = all.splitAt(all.length / 3)
      val (b, c) = rest.splitAt(rest.length / 4)
      input.addData(a.toIndexedSeq); q.processAllAvailable()
      input.addData(b.toIndexedSeq); q.processAllAvailable()
      input.addData(c.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("spikes")
        .select("event_type", "win_us", "n", "prev_n", "ratio")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
        .toSet
      val batch = graft.SparkEntry.queries("ev_spike")(spark, sfTiny)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      // the stream never emits a type's NEWEST window (still open without
      // a watermark-driven flush): batch minus each type's last pair
      val maxWin = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val expect = batch.filterNot(t => t._2 == maxWin(t._1)).toSet
      assert(got == expect)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream-static enrichment join matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // static dimension: per-type weight (the enrichment side a streaming
    // pipeline joins on every micro-batch without state)
    val dim = Seq(("click", 1L), ("view", 2L), ("purchase", 10L),
      ("error", 0L), ("scroll", 1L)).toDF("event_type", "weight")
    val input = MemoryStream[EventOps.Event]
    val q = input.toDF().join(dim, Seq("event_type"))
      .groupBy("event_type", "weight").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("complete").start()
    try {
      val all = toEvents.collect()
      val (a, b) = all.splitAt(all.length / 2)
      input.addData(a.toIndexedSeq); q.processAllAvailable()
      input.addData(b.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("enriched")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = eventsDF.join(dim, Seq("event_type"))
        .groupBy("event_type", "weight").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream attribution join emits the same pairs as batch") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventOps.Event]
    val views = MemoryStream[EventOps.Event]
    val joined = EventOps.attributionStream(
      clicks.toDF(), views.toDF(), windowMinutes = 60, watermark = "30 minutes")
      .select("click_id", "view_id")
    val q = joined.writeStream
      .format("memory").queryName("attrib").outputMode("append").start()
    try {
      // both sides fed in event-time order across two triggers: a click in
      // the second trigger must still find its in-window views from the
      // first (view state is retained up to watermark + join window)
      val all = toEvents.collect().sortBy(_.ts.getTime)
      val (a, b) = all.splitAt(all.length / 2)
      clicks.addData(a.toIndexedSeq); views.addData(a.toIndexedSeq)
      q.processAllAvailable()
      clicks.addData(b.toIndexedSeq); views.addData(b.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = EventOps.attributionPairs(eventsDF, 60)
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"stream ${got.size} pairs vs batch ${want.size}")
    } finally q.stop()
  }

  test("left-outer stream-stream join flushes unattributed clicks at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventOps.Event]
    val views = MemoryStream[EventOps.Event]
    val joined = EventOps.attributionStream(
      clicks.toDF(), views.toDF(), windowMinutes = 60,
      watermark = "30 minutes", joinType = "left_outer")
      .select("click_id", "view_id")
    val q = joined.writeStream
      .format("memory").queryName("attrib_outer").outputMode("append").start()
    try {
      val all = toEvents.collect().sortBy(_.ts.getTime)
      clicks.addData(all.toIndexedSeq); views.addData(all.toIndexedSeq)
      q.processAllAvailable()
      // a null-padded (unmatched) click may only emit once the watermark
      // proves no matching view can arrive: push it past everything
      val flushTs = new java.sql.Timestamp(all.last.ts.getTime + 7L * 24 * 3600 * 1000)
      clicks.addData(EventOps.Event(-1L, flushTs, 0L, "click", 0.0))
      views.addData(EventOps.Event(-2L, flushTs, 0L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("attrib_outer")
        .filter(col("click_id") >= 0) // drop the flush pair itself
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      val want = EventOps.attributionPairs(eventsDF, 60, "left_outer")
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(got == want, s"stream ${got.size} vs batch ${want.size}")
      // and the outer form really added null-padded rows over the inner one
      assert(want.exists(_._2 == -1L), "fixture must contain unattributed clicks")
    } finally q.stop()
  }

  test("partitioned file sink is exactly-once across a checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    // The streaming face of LayoutOps.writePartitioned: a Hive-partitioned
    // parquet sink whose _spark_metadata commit log gives exactly-once
    // file visibility. A batch that was written but not committed before
    // the stop must not surface twice after the restart replays it.
    val base = java.nio.file.Files.createTempDirectory("stream-sink")
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val all = toEvents.collect().sortBy(_.event_id)
    val (first, second) = all.splitAt(all.length / 2)
    val input = MemoryStream[EventOps.Event]

    def start() = input.toDF()
      .writeStream.format("parquet")
      .partitionBy("event_type")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try { input.addData(first.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    // same source instance + same checkpoint: the restarted query resumes
    // from the committed offset, re-emitting nothing already visible
    val q2 = start()
    try { input.addData(second.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()

    // read-back goes through the _spark_metadata log: exactly the input
    // multiset — no dropped batch, no double-committed batch
    val got = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == all.map(_.event_id).toSeq, s"got ${got.size} of ${all.size}")
    // and the layout is the partitioned one (dir per event_type, prunable)
    val dirs = java.nio.file.Files.list(java.nio.file.Path.of(out))
      .iterator()
    val typeDirs = scala.jdk.CollectionConverters.IteratorHasAsScala(dirs)
      .asScala.map(_.getFileName.toString).filter(_.startsWith("event_type="))
      .toSet
    assert(typeDirs == all.map(e => s"event_type=${e.event_type}").toSet)
    val pruned = spark.read.parquet(out).filter($"event_type" === "click")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters:"), "partition filter not pushed")
  }

  test("sessionization state survives a checkpoint restart: sessions " +
    "spanning the stop still close correctly") {
    implicit val sqlCtx = spark.sqlContext
    // The failure mode a 100 TB streaming ingest actually hits: the job
    // dies (or is redeployed) mid-stream and resumes from the
    // checkpoint. flatMapGroupsWithState's per-user open sessions live
    // in the state store — after the restart they must continue, not
    // reset, or every in-flight session at the stop emits wrong counts.
    val base = java.nio.file.Files.createTempDirectory("sess-restart")
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[EventOps.Event]
    def start() = EventOps.sessionizeStream(input.toDS()).toDF()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val all = toEvents.collect().sortBy(e => (e.ts.getTime, e.event_id))
    val batch = EventOps.sessionizeBatch(eventsDF)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // stream emits only CLOSED sessions (no timeout): batch minus each
    // user's final session — identical to the no-restart expectation
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    val expectedClosed = batch.filterNot(s => lastPerUser(s._1) == s).toSet
    // cut INSIDE a known multi-event closed session, so that session is
    // open in the state store at the stop and must resume after restart
    val spanning = expectedClosed.filter(s => s._3 > s._2)
    assert(spanning.nonEmpty, "fixture has no multi-event closed session")
    val target = spanning.minBy(s => (s._2, s._1))
    val cutUs = target._2 + 1
    val (a, b) = all.partition(_.ts.getTime * 1000L <= cutUs)
    assert(a.nonEmpty && b.nonEmpty)
    val q1 = start()
    try { input.addData(a.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { input.addData(b.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()
    val got = spark.read.parquet(out)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expectedClosed,
      "restart must not lose, duplicate, or mis-count any session")
    // the bisected session closed with its FULL event count — its state
    // (start time, running count) crossed the restart intact
    assert(got.contains(target),
      s"session $target bisected by the restart did not close correctly")
  }

  test("dedup-on-ingest state survives a checkpoint restart: duplicates " +
    "arriving after the restart stay suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("dedup-restart")
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val input = MemoryStream[EventOps.Event]
    def start() = EventOps.dedupStream(input.toDF(),
        Seq("event_type", "value"), watermark = "365 days")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val all = toEvents.collect().sortBy(_.event_id)
    val (a, b) = all.splitAt(all.length / 2)
    val q1 = start()
    try { input.addData(a.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { input.addData(b.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()
    val got = spark.read.parquet(out)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val want = EventOps.dedupBatch(eventsDF, Seq("event_type", "value"))
      .select("first_id").collect().map(_.getLong(0)).toSet
    assert(got == want,
      "restart must keep exactly the batch form's first arrivals")
    // the restart must have mattered: chunk b re-sends keys first seen
    // in chunk a, and every such resend was suppressed by RESTORED state
    val keysA = a.map(e => (e.event_type, e.value)).toSet
    val resentInB = b.filter(e => keysA((e.event_type, e.value)))
    assert(resentInB.nonEmpty,
      "the split did not exercise cross-restart dedup state")
    assert(resentInB.forall(e => !got(e.event_id)),
      "a duplicate key re-sent after the restart slipped through")
  }

  test("HDR sketch streaming aggregation state survives a checkpoint " +
    "restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("hdr-restart").toString
    val input = MemoryStream[EventOps.Event]
    def start(name: String) = EventOps.hdrSketchStream(input.toDF())
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    val all = toEvents.collect().sortBy(_.ts.getTime)
    val (a, b) = all.splitAt(all.length / 2)
    val q1 = start("hdr_r1")
    try {
      input.addData(a.toIndexedSeq); q1.processAllAvailable()
      val mid = spark.table("hdr_r1").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val midWant = EventOps.hdrSketchBatch(
          eventsDF.filter(col("event_id").isin(a.map(_.event_id).toIndexedSeq: _*)))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(mid == midWant, "pre-restart state must equal the chunk-a sketch")
    } finally q1.stop()
    // restart under a NEW sink table, same checkpoint: complete mode
    // re-emits the FULL aggregate, so the table after chunk b equals the
    // whole-corpus sketch only if chunk a's counts were restored
    val q2 = start("hdr_r2")
    try { input.addData(b.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()
    val got = spark.table("hdr_r2").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = EventOps.hdrSketchBatch(eventsDF).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want,
      "post-restart sketch must equal the whole-corpus batch sketch")
    // the quantile walk reads identically off the recovered state
    val qGot = graft.ops.SketchOps
      .hdrQuantilesFromTable(spark.table("hdr_r2")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val qWant = graft.ops.SketchOps
      .hdrQuantilesFromTable(EventOps.hdrSketchBatch(eventsDF)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(qGot == qWant)
  }

  test("batch sessionization respects the 30-minute gap rule") {
    val rows = EventOps.sessionizeBatch(eventsDF).collect()
    // session bounds are consistent
    rows.foreach { r =>
      assert(r.getAs[Long]("start_us") <= r.getAs[Long]("end_us"))
      assert(r.getAs[Long]("n_events") > 0)
    }
    // successive sessions of one user are separated by > gap
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("start_us"))
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(y.getAs[Long]("start_us") - x.getAs[Long]("end_us") >
            EventOps.SessionGapUs)
        case _ =>
      }
    }
  }

  test("funnel: ordering and bound edge cases on a pinned stream") {
    def ev(id: Long, user: Long, tMin: Long, typ: String) =
      EventOps.Event(id, new java.sql.Timestamp(tMin * 60000L), user, typ, 0.0)
    val rows = Seq(
      // u1: full funnel, each step 10 min apart
      ev(1, 1, 0, "view"), ev(2, 1, 10, "click"), ev(3, 1, 20, "purchase"),
      // u2: click BEFORE the view — stage 2 must not fire
      ev(4, 2, 0, "click"), ev(5, 2, 10, "view"),
      // u3: click 200 min after the only view — outside the 120-min bound
      ev(6, 3, 0, "view"), ev(7, 3, 200, "click"),
      // u4: stale first view, fresh second view rescues the click (the
      // closest-preceding-view rule), but no purchase
      ev(8, 4, 0, "view"), ev(9, 4, 300, "view"), ev(10, 4, 310, "click"),
      // u5: purchase before the qualifying click — stage 3 must not fire
      ev(11, 5, 0, "view"), ev(12, 5, 5, "purchase"), ev(13, 5, 10, "click")
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.funnelCounts(rows, boundMinutes = 120).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == ((5L, 3L, 1L)),
      s"expected views=5 (all users), clicks=3 (u1,u4,u5), purchases=1 (u1); got $out")
  }

  test("windowed CMS over a stream equals the batch sketch counter-for-counter") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventOps.Event]
    val q = EventOps.cmsPerWindowStream(input.toDF(), d = 2, w = 64)
      .writeStream.format("memory").queryName("cms_win")
      .outputMode("complete").start()
    try {
      val all = toEvents.collect().sortBy(_.ts.getTime)
      val (a, b) = all.splitAt(all.length / 3)
      input.addData(a.toIndexedSeq); q.processAllAvailable()
      input.addData(b.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("cms_win").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = EventOps.cmsPerWindow(eventsDF, d = 2, w = 64).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got == want,
        "CMS merges by sum — the streamed sketch must EQUAL the batch sketch")
      assert(got.nonEmpty && got.values.exists(_.exists(_ > 0)))
    } finally q.stop()
  }

  test("HDR sketch over a stream equals the batch sketch bucket-for-bucket") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventOps.Event]
    val q = EventOps.hdrSketchStream(input.toDF())
      .writeStream.format("memory").queryName("hdr_stream")
      .outputMode("complete").start()
    try {
      val all = toEvents.collect().sortBy(_.ts.getTime)
      val (a, b) = all.splitAt(all.length / 3)
      input.addData(a.toIndexedSeq); q.processAllAvailable()
      input.addData(b.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("hdr_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = EventOps.hdrSketchBatch(eventsDF).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want,
        "sum-monoid sketch: the streamed bucket table must EQUAL the batch one")
      // and the quantiles read identically off the streamed state
      val qGot = graft.ops.SketchOps
        .hdrQuantilesFromTable(spark.table("hdr_stream")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      val qWant = graft.ops.SketchOps
        .hdrQuantilesFromTable(EventOps.hdrSketchBatch(eventsDF)).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(qGot == qWant)
    } finally q.stop()
  }

  test("streaming funnel stage counts match the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventOps.Event]
    val q = EventOps.funnelStream(input.toDS(), boundMinutes = 120).toDF()
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      val all = toEvents.collect().sortBy(e => (e.ts.getTime, e.event_id))
      val (a, b) = all.splitAt(all.length / 2)
      input.addData(a.toIndexedSeq); q.processAllAvailable()
      input.addData(b.toIndexedSeq); q.processAllAvailable()
      val byUser = spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val got = (1L to 3L).map(s => byUser.values.count(_ >= s).toLong)
      val w = EventOps.funnelCounts(eventsDF, boundMinutes = 120)
        .collect().head
      assert(got == Seq(w.getLong(0), w.getLong(1), w.getLong(2)),
        s"stream stages $got vs batch $w")
      // each user emits each reached stage exactly once across triggers
      val emissions = spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(emissions.length == emissions.distinct.length)
    } finally q.stop()
  }

  test("streaming as-of enrichment matches the batch as-of join across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventOps.Event]
    val q = EventOps.asofStream(input.toDS()).toDF()
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // event-time-ordered replay in THREE uneven triggers: last-click
      // state must carry across trigger boundaries
      val all = toEvents.collect().sortBy(e => (e.ts.getTime, e.event_id))
      val cuts = Seq(all.length / 5, all.length / 2, all.length)
      var from = 0
      cuts.foreach { to =>
        input.addData(all.slice(from, to).toIndexedSeq)
        q.processAllAvailable()
        from = to
      }
      val got = spark.table("asof_stream").collect()
        .map(r => (r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val ev = eventsDF
      val want = graft.ops.AsofJoinOps.asofJoin(
        ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts"),
        ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts"),
        Seq("user_id"), "ts", "ts", Seq("event_id"), rightPrefix = "c_")
        .collect()
        .map(r => (r.getAs[Long]("event_id"),
          Option(r.getAs[java.lang.Long]("c_event_id")).map(_.longValue)))
        .toMap
      assert(got == want,
        s"stream ${got.size} purchases vs batch ${want.size}")
      assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
    } finally q.stop()
  }

  test("streamed HLL-store ingest: unioned blobs equal the one-shot sketch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.SketchOps
    val input = MemoryStream[EventOps.Event]
    val store = java.nio.file.Files
      .createTempDirectory("graft-hllstream").toString
    val q = EventOps.hllStoreSink(input.toDF(), store,
      Seq("event_type"), "user_id").start()
    try {
      // three micro-batches with overlapping users across batches — the
      // union must count each user once however the stream was chopped
      val all = toEvents.collect().sortBy(_.ts.getTime)
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val fromStore = SketchOps.readHllStore(spark, store, Seq("event_type"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val oneShot = eventsDF.groupBy("event_type")
        .agg(hll_sketch_estimate(
          hll_sketch_agg($"user_id", lit(12))).as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fromStore == oneShot,
        "micro-batched ingest must union to the one-shot sketch exactly")
      // replay invariance: re-appending a whole batch's blobs (what a
      // foreachBatch crash-redelivery does) must not move any estimate —
      // HLL union is a register-wise max, so x ∪ x = x. Only the store's
      // file count grows (reclaimed by compaction).
      val replayed = all.take(math.max(1, all.length / 3 + 1))
      SketchOps.writeHllStore(
        eventsDF.filter(col("event_id")
          .isin(replayed.map(_.event_id).toIndexedSeq: _*)),
        store, Seq("event_type"), $"user_id", lgK = 12, append = true)
      val afterReplay = SketchOps.readHllStore(spark, store, Seq("event_type"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(afterReplay == fromStore,
        "a replayed batch's duplicate blobs must not change any estimate")
    } finally q.stop()
  }
}
