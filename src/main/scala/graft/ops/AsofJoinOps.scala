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

    // Sort tags: at equal (key, ts) a right row matches the left row's
    // backward frame iff it sorts BEFORE it (frame is preceding..current)
    // and the forward frame iff it sorts AFTER it (current..following).
    // Inclusive semantics therefore put right first for Backward, last
    // for Forward; Nearest uses the Backward layout (an equal-ts match
    // is distance 0 and backward wins ties anyway, so forward may
    // harmlessly miss it).
    val rightFirst = direction match {
      case Backward | Nearest => allowExactMatches
      case Forward            => !allowExactMatches
    }
    val (lTag, rTag) = if (rightFirst) (1, 0) else (0, 1)

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

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__us").asc, col("__tag").asc, col("__r").asc_nulls_first)
    val bwd = last(col("__r"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("__r"), ignoreNulls = true)
      .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))

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
      .filter(col("__tag") === lTag && col("__l").isNotNull)
      .select(
        col("__l.*") +:
          col("__m.__rts").as(s"${rightPrefix}ts_us") +:
          rightPayload.map(n => col(s"__m.$n").as(s"$rightPrefix$n")): _*)
  }
}
