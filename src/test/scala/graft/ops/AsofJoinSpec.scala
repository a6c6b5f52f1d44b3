package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[AsofJoinOps.asofJoin]] — the gate entry (j8_asof) hash-compares the
  * backward direction against DuckDB's native ASOF LEFT JOIN; this spec
  * pins row-level equivalence with the naive correlated-subquery
  * formulation on real data, the forward / nearest / tolerance /
  * exact-match variants, deterministic tie-breaks at duplicate
  * timestamps, and the plan: one hash exchange on the key, no join
  * operator at all. */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  // (key, ts-seconds, id) helpers for the synthetic cases
  private def leftDf(rows: (Long, Long, Long)*): DataFrame =
    rows.map { case (k, t, i) => (k, ts(t), i) }.toDF("k", "lts", "lid")
  private def rightDf(rows: (Long, Long, Long)*): DataFrame =
    rows.map { case (k, t, i) => (k, ts(t), i) }.toDF("k", "rts", "rid")

  private def run(
      l: DataFrame, r: DataFrame,
      dir: AsofJoinOps.Direction = AsofJoinOps.Backward,
      tol: Option[Long] = None,
      exact: Boolean = true): Map[Long, Option[Long]] =
    AsofJoinOps.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("rid"),
        direction = dir, toleranceUs = tol, allowExactMatches = exact)
      .select("lid", "right_rid").collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap

  test("backward matches the naive correlated subquery on real events") {
    val ev = graft.queries.tEvents(spark, sfTiny)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("lid"), $"user_id".as("k"), $"ts".as("lts"))
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("rid"), $"user_id".as("k"), $"ts".as("rts"))
    val got = run(p, c)
    p.createOrReplaceTempView("p_naive")
    c.createOrReplaceTempView("c_naive")
    // latest click at or before, as the quadratic join + argmax — the
    // formulation the as-of operator exists to replace
    val naive = spark.sql(
      """SELECT p.lid, max_by(c.rid, struct(c.rts, c.rid)) AS rid
        |FROM p_naive p LEFT JOIN c_naive c
        |  ON c.k = p.k AND c.rts <= p.lts
        |GROUP BY p.lid""".stripMargin)
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    assert(got == naive)
    assert(got.nonEmpty && got.values.exists(_.isDefined) &&
      got.values.exists(_.isEmpty),
      "fixture must exercise both matched and unmatched purchases")
  }

  test("directions, inclusivity and tolerance on a pinned case") {
    val l = leftDf((1, 100, 10), (1, 200, 11), (2, 50, 12))
    val r = rightDf((1, 90, 20), (1, 100, 21), (1, 150, 22), (1, 260, 23))
    // backward inclusive: equal-ts right row (21) wins at t=100
    assert(run(l, r) ==
      Map(10L -> Some(21L), 11L -> Some(22L), 12L -> None))
    // backward exclusive: equal-ts row skipped → 20
    assert(run(l, r, exact = false) ==
      Map(10L -> Some(20L), 11L -> Some(22L), 12L -> None))
    // forward inclusive: at t=100 the equal-ts row 21 matches
    assert(run(l, r, dir = AsofJoinOps.Forward) ==
      Map(10L -> Some(21L), 11L -> Some(23L), 12L -> None))
    // forward exclusive: next strictly-later row 22
    assert(run(l, r, dir = AsofJoinOps.Forward, exact = false) ==
      Map(10L -> Some(22L), 11L -> Some(23L), 12L -> None))
    // nearest: t=200 is 50s from 22 and 60s from 23 → 22; equal distance
    // prefers backward (t=100: gap 0 backward wins outright)
    assert(run(l, r, dir = AsofJoinOps.Nearest) ==
      Map(10L -> Some(21L), 11L -> Some(22L), 12L -> None))
    // tolerance 30s: t=200's closest backward row is 50s away → null
    assert(run(l, r, tol = Some(30L * 1000000)) ==
      Map(10L -> Some(21L), 11L -> None, 12L -> None))
  }

  test("nearest with allowExactMatches=false excludes the equal-ts row on BOTH legs") {
    // right rows at t-5, t, t+10: with exact matches excluded, the
    // nearest must be t-5 (distance 5 beats 10), never the equal-ts row
    // — which previously leaked through the forward frame at distance 0
    val l = leftDf((1L, 100L, 1L))
    val r = rightDf((1L, 95L, 95L), (1L, 100L, 100L), (1L, 110L, 110L))
    assert(run(l, r, dir = AsofJoinOps.Nearest, exact = false) ==
      Map(1L -> Some(95L)))
    // with ONLY the equal-ts and a later row, nearest-no-exact takes the later
    val r2 = rightDf((1L, 100L, 100L), (1L, 110L, 110L))
    assert(run(l, r2, dir = AsofJoinOps.Nearest, exact = false) ==
      Map(1L -> Some(110L)))
    // with ONLY the equal-ts row, there is no match at all
    val r3 = rightDf((1L, 100L, 100L))
    assert(run(l, r3, dir = AsofJoinOps.Nearest, exact = false) ==
      Map(1L -> None))
  }

  test("nearest equal-distance tie prefers backward") {
    val l = leftDf((1, 100, 10))
    val r = rightDf((1, 90, 20), (1, 110, 21))
    assert(run(l, r, dir = AsofJoinOps.Nearest) == Map(10L -> Some(20L)))
  }

  test("duplicate right timestamps break ties deterministically (max payload)") {
    val l = leftDf((1, 100, 10))
    val r = rightDf((1, 90, 20), (1, 90, 25), (1, 90, 22))
    assert(run(l, r) == Map(10L -> Some(25L)),
      "backward takes the lexicographically largest payload at the tied ts")
    val rFwd = rightDf((1, 110, 31), (1, 110, 36), (1, 110, 33))
    assert(run(l, rFwd, dir = AsofJoinOps.Forward) == Map(10L -> Some(31L)),
      "forward takes the smallest payload at the tied ts")
  }

  test("bucketed variant: the data-sized exchange carries the time bucket") {
    val l = leftDf((1, 100, 10), (1, 200, 11), (2, 50, 12))
    val r = rightDf((1, 90, 20), (1, 150, 22), (2, 40, 21))
    val df = AsofJoinOps.asofJoinBackwardBucketed(
      l, r, Seq("k"), "lts", "rts", Seq("rid"), bucketUs = 60L * 1000000)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("hashpartitioning\\(k#\\d+L?, __b#".r.findFirstIn(p).isDefined,
      s"phase-1 window must partition by (key, bucket) — the hot-key fix:\n$p")
  }

  test("plan: one hash exchange on the key, no join operator") {
    val l = leftDf((1, 100, 10), (2, 200, 11))
    val r = rightDf((1, 90, 20), (2, 190, 21))
    val df = AsofJoinOps.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("rid"))
    df.collect()
    // AQE's toString prints the final AND the initial plan — keep only
    // the final one or every operator is counted twice
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.toLowerCase.contains("join"), s"asof must be join-free:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one hash exchange:\n$p")
    assert(!p.contains("SinglePartition"), s"window must stay keyed:\n$p")
  }
}
