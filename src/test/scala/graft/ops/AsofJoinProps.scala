package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Randomized differential tests for [[AsofJoinOps.asofJoin]]: every
  * direction × inclusivity × tolerance combination must equal a naive
  * in-memory model on adversarial inputs — duplicate timestamps on both
  * sides, left rows with no key on the right, dense tie clusters. The
  * model re-implements the documented tie rules directly (backward: max
  * payload at the winning ts; forward: min), so a drift in either the
  * window frames or the sort tags shows up as a value diff. */
class AsofJoinProps extends SparkTestBase {
  import spark.implicits._
  import AsofJoinOps._

  private case class L(k: Long, t: Long, lid: Long)
  private case class R(k: Long, t: Long, rid: Long)

  /** The naive model: scan all right rows per left row. */
  private def model(ls: Seq[L], rs: Seq[R], dir: Direction,
                    tolUs: Option[Long], exact: Boolean): Map[Long, Option[Long]] = {
    def usOf(t: Long) = t * 1000000L
    ls.map { l =>
      val lu = usOf(l.t)
      def inTol(ru: Long, gap: Long) = tolUs.forall(gap <= _)
      val bwd = rs.filter(r => r.k == l.k &&
          (if (exact) usOf(r.t) <= lu else usOf(r.t) < lu) &&
          inTol(usOf(r.t), lu - usOf(r.t)))
        .sortBy(r => (-usOf(r.t), -r.rid)).headOption // max ts, then max rid
      val fwd = rs.filter(r => r.k == l.k &&
          (if (exact) usOf(r.t) >= lu else usOf(r.t) > lu) &&
          inTol(usOf(r.t), usOf(r.t) - lu))
        .sortBy(r => (usOf(r.t), r.rid)).headOption // min ts, then min rid
      val chosen = dir match {
        case Backward => bwd
        case Forward  => fwd
        case Nearest => (bwd, fwd) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) =>
            if (usOf(f.t) - lu < lu - usOf(b.t)) Some(f) else Some(b)
        }
      }
      l.lid -> chosen.map(_.rid)
    }.toMap
  }

  test("bucketed backward asof equals the plain operator for any bucket width") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val nKeys = 1 + rng.nextInt(3)
      val span = 1 + rng.nextInt(25)
      val lDf = (0 until 50).map(i =>
          (rng.nextInt(nKeys).toLong, new Timestamp(rng.nextInt(span) * 1000L),
            1000L + i)).toDF("k", "lts", "lid")
      val rDf = (0 until 50).map(i =>
          (rng.nextInt(nKeys + 1).toLong, new Timestamp(rng.nextInt(span) * 1000L),
            2000L + i)).toDF("k", "rts", "rid")
      for {
        exact <- Seq(true, false)
        bucketUs <- Seq(1000000L, 3000000L, 7000000L, 1000000000L)
      } {
        def collectMap(df: org.apache.spark.sql.DataFrame) =
          df.select("lid", "right_rid").collect()
            .map(r => r.getLong(0) ->
              (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        val plain = collectMap(AsofJoinOps.asofJoin(
          lDf, rDf, Seq("k"), "lts", "rts", Seq("rid"),
          allowExactMatches = exact))
        val bucketed = collectMap(AsofJoinOps.asofJoinBackwardBucketed(
          lDf, rDf, Seq("k"), "lts", "rts", Seq("rid"),
          bucketUs = bucketUs, allowExactMatches = exact))
        assert(bucketed == plain,
          s"trial=$trial exact=$exact bucketUs=$bucketUs: " +
            s"${(bucketed.toSet diff plain.toSet).take(3)} / " +
            s"${(plain.toSet diff bucketed.toSet).take(3)}")
      }
    }
  }

  test("random streams with heavy ties equal the naive model, all variants") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      // tight domains force duplicate timestamps and shared keys
      val nKeys = 1 + rng.nextInt(4)
      val span = 1 + rng.nextInt(20)
      val ls = (0 until 60).map(i =>
        L(rng.nextInt(nKeys), rng.nextInt(span), 1000L + i))
      val rs = (0 until 60).map(i =>
        R(rng.nextInt(nKeys + 1), rng.nextInt(span), 2000L + i)) // +1: keys absent on left too
      val lDf = ls.map(l => (l.k, new Timestamp(l.t * 1000L), l.lid))
        .toDF("k", "lts", "lid")
      val rDf = rs.map(r => (r.k, new Timestamp(r.t * 1000L), r.rid))
        .toDF("k", "rts", "rid")
      for {
        dir <- Seq[Direction](Backward, Forward, Nearest)
        exact <- Seq(true, false) if !(dir == Nearest && !exact)
        tol <- Seq(None, Some(3L * 1000000))
      } {
        val got = AsofJoinOps.asofJoin(lDf, rDf, Seq("k"), "lts", "rts",
            Seq("rid"), direction = dir, toleranceUs = tol,
            allowExactMatches = exact)
          .select("lid", "right_rid").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        val want = model(ls, rs, dir, tol, exact)
        assert(got == want,
          s"trial=$trial dir=$dir exact=$exact tol=$tol: " +
            s"diff=${(got.toSet diff want.toSet).take(3)} / ${(want.toSet diff got.toSet).take(3)}")
      }
    }
  }
}
