package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators over the `events` schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Each op is written against a plain DataFrame so the *same* code path
  * serves batch (the driver's oracle-checked queries) and Structured
  * Streaming (`readStream` + watermark; exercised with MemoryStream in
  * the spec). The reference is batch-only (SURVEY.md §2.9) — this module
  * is the extension surface for streaming parity.
  */
object EventOps {

  /** Tumbling-window counts/sums per event type. On a stream add
    * `.withWatermark("ts", ...)` upstream; the aggregation is identical.
    * Sums go through decimal(18,2) partials like [[sessionizeBatch]]'s —
    * raw double partials are accumulation-order-dependent, so the
    * streamed totals could differ from the batch in the last ulp. */
  def windowedAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .select(
        unix_micros(col("w.start")).as("win_start_us"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming form: event-time watermark + the same windowed agg. */
  def windowedAggStream(events: DataFrame, width: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    windowedAgg(events.withWatermark("ts", watermark), width)

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, session_id: Long, start_us: Long,
                           end_us: Long, n_events: Long, total_value: Double)
  /** Open-session state: (sessionStart, lastTs, count, total). Tuple, not
    * case class — nested-case-class state trips Janino codegen. */
  // (start_us, last_us, n_events, total_CENTS): values accumulate as
  // integer cents — the exact state the batch's decimal(18,2) partials
  // hold — so streamed totals equal the batch bit-for-bit for ANY double
  // inputs, not just 2-decimal ones (raw double accumulation diverged
  // from the batch's per-element HALF_UP rounding, e.g. value = 0.125)
  private type SessState = (Long, Long, Long, Long)

  /** One value as integer cents, rounded exactly like Spark's
    * double→decimal(18,2) cast (HALF_UP over the shortest-decimal form). */
  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  /** Timestamp → epoch micros. `floorDiv`, not `/`: for pre-epoch
    * timestamps `getTime` is negative and `/` truncates toward zero,
    * which would place the event one second (and hence one window) later
    * than the batch side's `date_trunc`/`floorMod` alignment — a silent
    * batch/stream parity break for pre-1970 data. The fractional second
    * is re-added from `getNanos` (always non-negative). */
  private def epochMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  val SessionGapUs: Long = 30L * 60 * 1000000 // 30 min

  /** The RocksDB state-store provider. At real scale the state behind
    * `flatMapGroupsWithState` / `dropDuplicatesWithinWatermark` belongs in
    * RocksDB — bounded executor heap, native-memory + local-disk state,
    * incremental snapshot upload — where the default HDFS-backed provider
    * keeps EVERY key of every active version on the JVM heap (the OOM
    * cliff for high-cardinality session/dedup state). Same results either
    * way (StreamingSpec runs sessionization under both). */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the session's streaming state store switched to
    * RocksDB, restoring the previous setting after. Queries STARTED inside
    * pick the provider up; already-running queries are unaffected. */
  def withRocksDBStateStore[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, RocksDBProvider)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Batch sessionization: a session breaks when the gap to the previous
    * event of the same user exceeds 30 min. Window-function form
    * (lag → gap flag → running sum = session id) — one shuffle on user_id. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap",
        when(col("us") - lag("us", 1).over(byUser) > SessionGapUs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("gap").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min("us").as("start_us"), max("us").as("end_us"),
        count(lit(1)).as("n_events"),
        // decimal-exact partials -> order-independent double (oracle-safe)
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
  }

  /** Streaming sessionization with explicit state: same 30-min-gap
    * semantics via flatMapGroupsWithState. Event-time ordering within a
    * user is guaranteed by sorting the buffered group per trigger —
    * correct under the test's single-batch replay; production use adds a
    * watermark + ProcessingTimeTimeout eviction. */
  def sessionizeStream(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessState], Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[List[SessState]]) =>
          val sorted = it.toVector.sortBy(e =>
            (epochMicros(e.ts), e.event_id))
          var cur = state.getOption.getOrElse(Nil).headOption
          val done = List.newBuilder[SessState]
          sorted.foreach { e =>
            val us = epochMicros(e.ts)
            cur match {
              case Some((start, last, n, total)) if us - last <= SessionGapUs =>
                cur = Some((start, us, n + 1, total + cents(e.value)))
              case other =>
                other.foreach(done += _)
                cur = Some((us, us, 1L, cents(e.value)))
            }
          }
          state.update(cur.toList)
          // emit closed sessions; session_id = start-time surrogate
          done.result().iterator.map { case (start, last, n, total) =>
            Session(user, start, start, last, n, total / 100.0)
          }
      }
  }

  /** Production-shaped streaming sessionization: same 30-min-gap
    * semantics, plus WATERMARK-DRIVEN EVICTION — when event time passes
    * a session's gap horizon, the open session times out, flushes, and
    * its state is removed. State per user is therefore bounded by the
    * watermark, and final sessions DO emit (the no-timeout variant above
    * only ever emits closed-by-successor sessions). */
  def sessionizeStreamEvicting(events: Dataset[Event],
                               watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessState], Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[List[SessState]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.getOrElse(Nil).map {
              case (start, last, n, total) => Session(user, start, start, last, n, total / 100.0)
            }
            state.remove()
            out.iterator
          } else {
            val sorted = it.toVector.sortBy(e =>
              (epochMicros(e.ts), e.event_id))
            var cur = state.getOption.getOrElse(Nil).headOption
            val done = List.newBuilder[SessState]
            sorted.foreach { e =>
              val us = epochMicros(e.ts)
              cur match {
                case Some((start, last, n, total)) if us - last <= SessionGapUs =>
                  cur = Some((start, us, n + 1, total + cents(e.value)))
                case other =>
                  other.foreach(done += _)
                  cur = Some((us, us, 1L, cents(e.value)))
              }
            }
            state.update(cur.toList)
            // evict once event time passes the open session's gap horizon
            cur.foreach { case (_, last, _, _) =>
              state.setTimeoutTimestamp(last / 1000 + SessionGapUs / 1000)
            }
            done.result().iterator.map { case (start, last, n, total) =>
              Session(user, start, start, last, n, total / 100.0)
            }
          }
      }
  }

  final case class Transition(user_id: Long, from_type: String,
                              to_type: String)

  /** Batch transition matrix (the ev_transitions gate shape): adjacent
    * per-user event pairs via LEAD, aggregated to counts and exact-ppm
    * probabilities on the |types|²-bounded frame. */
  def transitionsBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_ppm",
        expr("n * 1000000 div sum(n) over (partition by from_type)"))
  }

  /** Streaming twin: per-user LAST-EVENT state (three scalars — O(1) per
    * user, no buffering), each arriving event emits its transition from
    * the predecessor, across micro-batch boundaries included. The
    * matrix itself is a plain downstream aggregation of the emitted
    * pairs. Within-trigger ordering by (ts, event_id), same caveat and
    * remedy as [[sessionizeStream]] (watermark + timeout in production). */
  def transitionsStream(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, String), Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event],
         state: GroupState[(Long, Long, String)]) =>
          val sorted = it.toVector.sortBy(e => (epochMicros(e.ts), e.event_id))
          var last = state.getOption
          val out = Vector.newBuilder[Transition]
          sorted.foreach { e =>
            last.foreach { case (_, _, prevType) =>
              out += Transition(user, prevType, e.event_type)
            }
            last = Some((epochMicros(e.ts), e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Exact dedup-on-ingest, keyed on content columns — the events-table
    * face of the documents dedup family. Batch form: the first (lowest
    * event_id) event per key plus the duplicate count. */
  def dedupBatch(events: DataFrame, keys: Seq[String]): DataFrame =
    events.groupBy(keys.map(col): _*)
      .agg(min("event_id").as("first_id"), count(lit(1)).as("n"))

  /** Streaming form: keep the first arrival per key,
    * `dropDuplicatesWithinWatermark` — dedup state is BOUNDED by the
    * watermark horizon, the only configuration that survives an unbounded
    * stream (plain `dropDuplicates` state grows forever). */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  final case class Spike(event_type: String, win_us: Long, n: Long,
                         prev_n: Long, ratio: Double)

  /** Streaming window-over-window spike detection with explicit state —
    * the stream form of the batch `ev_spike` query. State per event type:
    * (open hourly window counts, last emitted window). A window's ratio is
    * emitted once a STRICTLY LATER window exists for the type (the newest
    * window stays open — its count may still grow); emitted windows are
    * pruned from state except the newest emitted one, which remains as the
    * next pair's predecessor. Same single-batch-replay caveat as
    * [[sessionizeStream]]: production adds a watermark so late events
    * can't land behind an emitted window. */
  def spikeStream(events: Dataset[Event],
                  widthUs: Long = 3600L * 1000000): Dataset[Spike] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[(Map[Long, Long], Long), Spike](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, it: Iterator[Event],
         state: GroupState[(Map[Long, Long], Long)]) =>
          val (wins0, emitted0) =
            state.getOption.getOrElse((Map.empty[Long, Long], Long.MinValue))
          val wins = it.foldLeft(wins0) { (m, e) =>
            val us = epochMicros(e.ts)
            val w = us - java.lang.Math.floorMod(us, widthUs)
            m.updated(w, m.getOrElse(w, 0L) + 1)
          }
          val sorted = wins.keys.toSeq.sorted
          val maxW = if (sorted.isEmpty) Long.MinValue else sorted.last
          val out = sorted.sliding(2).collect {
            case Seq(p, c) if c < maxW && c > emitted0 =>
              // same rounding as the batch query's round(n/prev, 4)
              Spike(typ, c, wins(c), wins(p),
                BigDecimal(wins(c).toDouble / wins(p))
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }.toList
          val emitted = out.lastOption.map(_.win_us).getOrElse(emitted0)
          state.update((wins.filter { case (w, _) => w >= emitted }, emitted))
          out.iterator
      }
  }

  /** View→click attribution pairs: every (click, view) of the same user
    * where the view happened within `windowMinutes` BEFORE the click
    * (inclusive of the click instant). The same join definition serves
    * batch and the stream-stream form below — one equi-key (user_id)
    * shuffle with the time bounds as a post-join range condition, the
    * standard ad-attribution / action-to-cause shape.
    *
    * At scale the equi-key carries the join (SortMergeJoin on user_id);
    * the range bound only trims pairs within a user's sorted run — never
    * a cartesian across users. */
  def attributionPairs(events: DataFrame, windowMinutes: Int = 10,
                       joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("cts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        col("user_id").as("vuser"), col("ts").as("vts"))
    clicks.join(views,
      col("user_id") === col("vuser") &&
        col("vts") <= col("cts") &&
        col("vts") > col("cts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
  }

  /** Batch attribution rollup: per click, how many candidate views and
    * the max view id (deterministic representative). Inner join — clicks
    * with no in-window view carry no attribution row. */
  def attributeClicksBatch(events: DataFrame, windowMinutes: Int = 10): DataFrame =
    attributionPairs(events, windowMinutes)
      .groupBy(col("click_id"), col("user_id"),
        unix_micros(col("cts")).as("click_us"))
      .agg(count(lit(1)).as("n_views"), max(col("view_id")).as("last_view_id"))

  /** Stream-stream interval join: the same attribution pairs over two
    * live streams. Both sides carry an event-time watermark and the join
    * condition bounds `vts` relative to `cts`, so Spark derives a state
    * watermark for each side — view state is dropped once no future click
    * can reach back to it, click state once its window has passed: state
    * is bounded by `watermark + windowMinutes` of data per user, not the
    * stream's history. Emits the raw pairs (append mode); parity with
    * [[attributionPairs]] is asserted in StreamingSpec. */
  /** `joinType = "left_outer"` additionally emits unattributed clicks
    * (null view columns) — but only once the watermark proves no matching
    * view can still arrive; until then the click is held in state, which
    * is why outer results trail inner ones by the watermark delay. */
  def attributionStream(clicks: DataFrame, views: DataFrame,
                        windowMinutes: Int = 10,
                        watermark: String = "30 minutes",
                        joinType: String = "inner"): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("cts"))
      .withWatermark("cts", watermark)
    val v = views.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"),
        col("user_id").as("vuser"), col("ts").as("vts"))
      .withWatermark("vts", watermark)
    c.join(v,
      col("user_id") === col("vuser") &&
        col("vts") <= col("cts") &&
        col("vts") > col("cts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
  }

  /** Per-window Count-Min sketch of the key column — frequency
    * monitoring over a live stream with FIXED state per window (d·w
    * counters) no matter how many distinct keys pass. Because CMS
    * merges by element-wise sum, the streamed sketch equals the batch
    * sketch of the same window EXACTLY (order/trigger-invariant —
    * StreamingSpec pins it); a Misra-Gries twin could only promise its
    * bound, not counter equality. */
  def cmsPerWindowStream(events: DataFrame, d: Int, w: Int,
                         width: String = "1 hour",
                         watermark: String = "2 hours"): DataFrame =
    cmsPerWindow(events.withWatermark("ts", watermark), d, w, width)

  /** Batch twin of [[cmsPerWindowStream]]. */
  def cmsPerWindow(events: DataFrame, d: Int, w: Int,
                   width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width))
      .agg(graft.ops.SketchOps
        .countMin(col("user_id").cast("string"), d, w).as("cms"))
      .select(unix_micros(col("window.start")).as("win_us"), col("cms"))

  /** HDR quantile sketch over a stream: the (group, bucket) count table
    * is a plain streaming aggregation — a sum monoid needs no custom
    * state, so however the stream is micro-batched the accumulated table
    * EQUALS the batch sketch, and p50/p90/p99 read off it downstream
    * with the same [[graft.ops.SketchOps.hdrQuantilesFromTable]] walk
    * (StreamingSpec pins both equalities). */
  def hdrSketchStream(events: DataFrame, subBits: Int = 5,
                      watermark: String = "2 hours"): DataFrame =
    hdrSketchBatch(events.withWatermark("ts", watermark), subBits)

  /** Batch twin of [[hdrSketchStream]]. */
  def hdrSketchBatch(events: DataFrame, subBits: Int = 5): DataFrame =
    graft.ops.SketchOps.hdrBucketTable(events,
      col("event_type"), round(col("value") * 100).cast("long"), subBits)

  /** Streaming ingest into the persisted HLL rollup store
    * ([[graft.ops.SketchOps.writeHllStore]]): each micro-batch APPENDS its
    * own per-cell register blobs — no read-modify-write, no state store,
    * because HLL union is max-commutative: however the stream is
    * micro-batched, unioning the accumulated blobs at read time gives
    * exactly the one-shot sketch of everything ingested (StreamingSpec
    * pins the equality). This is the streaming path every sketch-rollup
    * table wants: sink cost ∝ batch size, store growth ∝ cells × batches
    * (bounded by a later compaction, same as any append store), query
    * cost ∝ cells.
    *
    * Replay semantics: a foreachBatch crash-redelivery appends the same
    * blobs twice — and the ESTIMATES don't move, because HLL union is a
    * register-wise max (idempotent: x ∪ x = x). The duplicate blobs are
    * pure store bloat, reclaimed by the next compactHllStore; no tag
    * ledger needed (StreamingSpec pins the replay invariance). */
  def hllStoreSink(events: DataFrame, path: String, groupCols: Seq[String],
                   keyCol: String, lgK: Int = 12)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.SketchOps.writeHllStore(
          batch, path, groupCols, col(keyCol), lgK, append = true)
      }

  /** Time-bounded funnel (view → click → purchase, each step within
    * `boundMinutes` of the one before): per-stage distinct-user counts.
    *
    * Sequential pattern matching without a self-join: the naive
    * formulation is a TRIPLE self-join on user (quadratic-ish per key);
    * here each user's sorted run is scanned once — a click qualifies iff
    * the MOST RECENT preceding view (running max over the
    * preceding-rows frame, so "∃ view within bound" exactly) is within
    * the bound, a purchase iff the most recent qualifying click is. One
    * hash shuffle on user_id, two frames over one sort, then a count.
    * The gate's DuckDB oracle is the independent exists-join
    * formulation. */
  def funnelCounts(events: DataFrame, boundMinutes: Int = 120): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bUs = boundMinutes * 60L * 1000000L
    // RANGE frame ending at -1 µs: each step must be STRICTLY earlier
    // than the next (the oracle's v.ts < c.ts < p.ts) — a rows frame
    // would let a same-microsecond view qualify a click, diverging from
    // the oracle and depending on tie order; the range frame is also
    // deterministic under ties without any tiebreak column
    val w = Window.partitionBy("user_id").orderBy("us")
    val prev = w.rangeBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("us"))).over(prev))
      .withColumn("qual_click",
        col("event_type") === "click" && col("last_view").isNotNull &&
          col("us") - col("last_view") <= bUs)
      .withColumn("last_qclick",
        max(when(col("qual_click"), col("us"))).over(prev))
      .withColumn("qual_purchase",
        col("event_type") === "purchase" && col("last_qclick").isNotNull &&
          col("us") - col("last_qclick") <= bUs)
      .groupBy("user_id")
      .agg(
        max(when(col("event_type") === "view", 1L).otherwise(0L)).as("s1"),
        max(when(col("qual_click"), 1L).otherwise(0L)).as("s2"),
        max(when(col("qual_purchase"), 1L).otherwise(0L)).as("s3"))
      .agg(sum("s1").as("n_view"), sum("s2").as("n_view_click"),
        sum("s3").as("n_view_click_purchase"))
  }

  /** Per-user live funnel state: epoch-µs of the last view and of the
    * last view-qualified click (0 = none yet), plus the user's emitted
    * stage so far (0–3). */
  final case class FunnelStage(user_id: Long, stage: Long)

  /** Streaming twin of [[funnelCounts]]'s per-user stage machine: emits
    * a (user, stage) row whenever a user REACHES a new funnel stage
    * (1 = viewed, 2 = clicked within bound of a view, 3 = purchased
    * within bound of a qualifying click). `SELECT stage, COUNT(*)` over
    * the output reproduces the batch per-stage counts — StreamingSpec
    * pins it. State is three numbers per user; the same
    * ordered-replay caveat as [[asofStream]] applies. */
  def funnelStream(events: Dataset[Event],
                   boundMinutes: Int = 120): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    val bUs = boundMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), FunnelStage](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event],
         state: GroupState[(Long, Long, Long)]) =>
          val sorted = it.toVector.sortBy(e => (epochMicros(e.ts), e.event_id))
          // Long.MinValue = "none yet": a 0L sentinel made events AT or
          // BEFORE the epoch (us <= 0) unable to qualify later stages,
          // silently breaking batch/stream parity for pre-epoch data
          var (lastView, lastQClick, stage) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue, 0L))
          val out = Vector.newBuilder[FunnelStage]
          def reach(s: Long): Unit = if (s > stage) {
            stage = s; out += FunnelStage(user, s)
          }
          sorted.foreach { e =>
            val us = epochMicros(e.ts)
            e.event_type match {
              case "view" =>
                lastView = us; reach(1L)
              case "click" if lastView != Long.MinValue && us > lastView &&
                  us - lastView <= bUs =>
                lastQClick = us; reach(2L)
              case "purchase" if lastQClick != Long.MinValue && us > lastQClick &&
                  us - lastQClick <= bUs =>
                reach(3L)
              case _ =>
            }
          }
          state.update((lastView, lastQClick, stage))
          out.result().iterator
      }
  }

  /** One enriched purchase: the latest click by the same user at or
    * before it (None = no click yet — the left-outer null of the batch
    * as-of join). */
  final case class AsofMatch(user_id: Long, purchase_id: Long,
                             purchase_us: Long, click_id: Option[Long],
                             click_us: Option[Long])

  /** Streaming as-of enrichment — [[graft.ops.AsofJoinOps]]'s backward
    * direction over a live stream. A stream-stream join can't express
    * "the LATEST preceding row" (it emits every in-window pair), so this
    * is explicit state: per user, the single (click_us, click_id) last
    * seen — O(1) state per key, vs the interval join's
    * watermark+window buffer. Each trigger's buffered group is sorted by
    * event time (clicks before purchases at equal ts, then id — the
    * batch operator's exact tie rules), clicks advance the state,
    * purchases emit enriched. Parity with the batch operator holds under
    * event-time-ordered arrival across triggers (StreamingSpec); a click
    * arriving late, after a later purchase already emitted, enriches
    * only subsequent purchases — append-mode streams don't retract.
    * Production adds watermark + timeout eviction for dead keys; the
    * RocksDB provider toggle covers crawl-scale keyspaces. */
  def asofStream(events: Dataset[Event]): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), AsofMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[(Long, Long)]) =>
          val sorted = it.toVector.sortBy(e =>
            (epochMicros(e.ts), if (e.event_type == "click") 0 else 1,
              e.event_id))
          var last: Option[(Long, Long)] = state.getOption
          val out = Vector.newBuilder[AsofMatch]
          sorted.foreach { e =>
            val us = epochMicros(e.ts)
            if (e.event_type == "click") last = Some((us, e.event_id))
            else out += AsofMatch(user, e.event_id, us,
              last.map(_._2), last.map(_._1))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Flush helper for tests: closed + open sessions from the final state
    * are not visible without a timeout; batch parity is asserted against
    * `sessionizeBatch`. Top event types per sliding window (rank-in-window
    * composite op). */
  def topTypesPerDay(events: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("day").orderBy(desc("n"), col("event_type"))
    daily.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("day").cast("string").as("day"),
        col("event_type"), col("n"), col("rank"))
  }
}
