package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** As-of (temporal lookup) joins.
  *
  * "For each left row, the latest right row with the same key whose
  * timestamp is at or before the left row's" — the canonical
  * event-attribution / point-in-time-features / market-data shape
  * (pandas `merge_asof`, kdb `aj`, DuckDB `ASOF JOIN`). Spark has no
  * native operator: the naive formulations are a range join (planned as
  * a nested loop — dead at 100 TB) or a per-left-row correlated
  * `max(ts)` subquery (a second aggregation + self-join over the right
  * side).
  *
  * Implementation here is the union-tag linear scan: tag both sides,
  * union them into one stream of (key, ts)-sorted rows, and propagate
  * the last-seen right payload across the sorted run with
  * `last(_, ignoreNulls)` over `rowsBetween(unboundedPreceding,
  * currentRow)`. One hash shuffle on the key, one in-partition sort,
  * zero joins; the window is keyed (never global), so partitions stay
  * balanced for any key cardinality that a join on the same key would
  * have handled. Forward matches come from the mirrored frame
  * (`first(_, ignoreNulls)` over current→following) in the SAME
  * WindowExec — both directions share the one sort.
  *
  * Tie rules, all deterministic:
  *  - left vs right at equal ts: governed by `allowExactMatches`
  *    (inclusive ⇒ an equal-ts right row matches), encoded purely in
  *    the union sort tag;
  *  - right vs right at equal (key, ts): the payload struct itself is
  *    the final sort key, so backward takes the lexicographically
  *    largest payload and forward the smallest (put a unique id first
  *    in `rightPayload` to pin this);
  *  - nearest with equal distance: backward wins.
  */
object AsofJoinOps {

  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction
  case object Nearest extends Direction

  /** As-of join `left` to `right` on equal `keys` and the time rule of
    * `direction` over `leftTs`/`rightTs` (timestamp columns).
    *
    * Output: all columns of `left`, plus for each name `p` in
    * `rightPayload` a column `s"$rightPrefix$p"` carrying the matched
    * right row's value, plus `s"${rightPrefix}ts_us"` (matched right
    * timestamp, epoch µs). Unmatched left rows are kept with nulls
    * (left-outer, like `merge_asof`). `toleranceUs` nulls out matches
    * farther than the given µs distance.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      direction: Direction = Backward,
      toleranceUs: Option[Long] = None,
      allowExactMatches: Boolean = true,
      rightPrefix: String = "right_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equi key")
    require(!rightPayload.contains(rightTs),
      s"rightPayload must not repeat $rightTs (emitted as ${rightPrefix}ts_us)")

    // Payload structs. The right payload leads with the match timestamp
    // in epoch µs so tolerance / gap math never re-touches timestamps.
    val rpayType = StructType(
      StructField("__rts", LongType, nullable = true) +:
        rightPayload.map(n => right.schema(n)))
    val lpayType = StructType(left.schema.fields)

    // Per-LEG sort tags: at equal (key, ts) a right row matches the left
    // row's backward frame iff it sorts BEFORE it (frame is
    // preceding..current) and the forward frame iff it sorts AFTER it
    // (current..following). Inclusive semantics therefore need OPPOSITE
    // layouts for the two legs — one shared layout made
    // Nearest + allowExactMatches=false leak the equal-ts row through
    // the forward frame at distance 0 (and `first` cannot skip past it
    // to the genuinely-later row). Two tag columns give each leg its own
    // window order; both orders share the one hash exchange on the key.
    val (lTagB, rTagB) = if (allowExactMatches) (1, 0) else (0, 1)
    val (lTagF, rTagF) = if (allowExactMatches) (0, 1) else (1, 0)

    val lU = left.select(
      keys.map(col) ++ Seq(
        unix_micros(col(leftTs)).as("__us"),
        lit(lTagB).as("__tb"),
        lit(lTagF).as("__tf"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
        lit(null).cast(rpayType).as("__r")): _*)
    val rU = right.select(
      keys.map(col) ++ Seq(
        unix_micros(col(rightTs)).as("__us"),
        lit(rTagB).as("__tb"),
        lit(rTagF).as("__tf"),
        lit(null).cast(lpayType).as("__l"),
        struct(unix_micros(col(rightTs)).as("__rts") +:
          rightPayload.map(col): _*).as("__r")): _*)

    val wB = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__us").asc, col("__tb").asc, col("__r").asc_nulls_first)
    val wF = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__us").asc, col("__tf").asc, col("__r").asc_nulls_first)
    val bwd = last(col("__r"), ignoreNulls = true)
      .over(wB.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("__r"), ignoreNulls = true)
      .over(wF.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    def gated(m: Column, gapUs: Column): Column = toleranceUs match {
      case Some(tol) => when(m.isNotNull && gapUs <= tol, m)
      case None      => m
    }
    val us = col("__us")
    val matched: Column = direction match {
      case Backward => gated(bwd, us - bwd.getField("__rts"))
      case Forward  => gated(fwd, fwd.getField("__rts") - us)
      case Nearest =>
        val b = gated(bwd, us - bwd.getField("__rts"))
        val f = gated(fwd, fwd.getField("__rts") - us)
        when(b.isNull, f)
          .when(f.isNull, b)
          .when(f.getField("__rts") - us < us - b.getField("__rts"), f)
          .otherwise(b)
    }

    lU.unionByName(rU)
      .withColumn("__m", matched)
      .filter(col("__l").isNotNull) // left rows alone carry a left struct
      .select(
        col("__l.*") +:
          col("__m.__rts").as(s"${rightPrefix}ts_us") +:
          rightPayload.map(n => col(s"__m.$n").as(s"$rightPrefix$n")): _*)
  }

  /** Hot-key-safe backward as-of join.
    *
    * [[asofJoin]] partitions by the key alone — correct at any key
    * CARDINALITY, but a single pathological key (one instrument trading
    * a billion ticks, one service emitting most of the log) funnels its
    * whole timeline through one task's sort. This variant adds the time
    * axis to the partitioning: rows group by (key, ⌊ts/bucketUs⌋), the
    * union-tag scan runs inside each bucket, and what crosses buckets
    * is only each bucket's LAST right payload — a one-row-per-
    * (key, bucket) summary frame whose prefix scan costs nothing. A left
    * row that finds no in-bucket match takes the latest previous
    * bucket's carry. Same semantics as `asofJoin(..., Backward)`
    * including tie rules (equality is property-tested); pick `bucketUs`
    * near the match horizon so summaries stay small and buckets stay
    * balanced.
    */
  def asofJoinBackwardBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      bucketUs: Long,
      allowExactMatches: Boolean = true,
      rightPrefix: String = "right_"): DataFrame = {
    require(keys.nonEmpty && bucketUs > 0)
    require(!rightPayload.contains(rightTs))
    val rpayType = StructType(
      StructField("__rts", LongType, nullable = true) +:
        rightPayload.map(n => right.schema(n)))
    val lpayType = StructType(left.schema.fields)
    val (lTag, rTag) = if (allowExactMatches) (1, 0) else (0, 1)

    val lU = left.select(
      keys.map(col) ++ Seq(
        unix_micros(col(leftTs)).as("__us"),
        lit(lTag).as("__tag"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
        lit(null).cast(rpayType).as("__r")): _*)
    val rU = right.select(
      keys.map(col) ++ Seq(
        unix_micros(col(rightTs)).as("__us"),
        lit(rTag).as("__tag"),
        lit(null).cast(lpayType).as("__l"),
        struct(unix_micros(col(rightTs)).as("__rts") +:
          rightPayload.map(col): _*).as("__r")): _*)
    val u = lU.unionByName(rU)
      .withColumn("__b", floor(col("__us") / bucketUs))

    // phase 1: the scan, partitioned by (key, bucket)
    val wB = Window
      .partitionBy((keys.map(col) :+ col("__b")): _*)
      .orderBy(col("__us").asc, col("__tag").asc, col("__r").asc_nulls_first)
    val local = u.withColumn("__m",
      last(col("__r"), ignoreNulls = true)
        .over(wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // per-(key, bucket) summary over ALL buckets that hold any row —
    // including right-empty ones (their left rows still need a carry):
    // max(__r) is the bucket's last right payload, null if none (max
    // ignores nulls; (__rts, payload…) lexicographic max ≡ the scan's
    // end state)
    val summaries = u
      .groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(max(col("__r")).as("__last"))
    // carry into bucket b = latest non-null summary of any bucket < b:
    // lag(1) excludes the own bucket, the running last() skips over
    // right-empty predecessors. The window runs over ONE ROW PER BUCKET
    // per key — summary-scale, not data-scale: the hot key costs
    // #buckets rows here
    val wS = Window.partitionBy(keys.map(col): _*).orderBy(col("__b").asc)
    val carries = summaries.withColumn("__prev",
      lag(col("__last"), 1).over(wS))
      .withColumn("__carry",
        last(col("__prev"), ignoreNulls = true)
          .over(wS.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select((keys.map(col) :+ col("__b") :+ col("__carry")): _*)

    local
      .filter(col("__tag") === lTag)
      .join(carries, keys :+ "__b", "left")
      .withColumn("__m", coalesce(col("__m"), col("__carry")))
      .select(
        col("__l.*") +:
          col("__m.__rts").as(s"${rightPrefix}ts_us") +:
          rightPayload.map(n => col(s"__m.$n").as(s"$rightPrefix$n")): _*)
  }
}
