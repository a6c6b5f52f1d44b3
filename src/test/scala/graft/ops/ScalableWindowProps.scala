package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized differential tests: every ScalableWindow op must equal its
  * naive single-partition formulation on adversarial inputs — skewed key
  * ranges, null values, empty buckets (keys clustered far from quantile
  * boundaries), tiny and empty frames. Order keys are kept UNIQUE: with
  * ties both formulations are legitimately nondeterministic (row frames
  * over tied keys), so ties are exercised separately in
  * [[ScalableWindowSpec]] via value-level assertions. */
class ScalableWindowProps extends SparkTestBase {
  import spark.implicits._

  private def cases: Seq[(String, Seq[(Long, Option[Double])])] = {
    def gen(seed: Int, n: Int, keySpread: Long): Seq[(Long, Option[Double])] = {
      val rng = new scala.util.Random(seed)
      val keys = scala.collection.mutable.LinkedHashSet.empty[Long]
      while (keys.size < n) keys += (rng.nextLong() % keySpread)
      keys.toSeq.map { k =>
        // cent-valued doubles: exact in binary AND at decimal(18,2), so
        // the decimal prefix-sum comparison is bit-exact (scale 10 would
        // trip Spark's precision-38 cap into scale-reducing rounds)
        k -> (if (rng.nextInt(4) == 0) None
              else Some(rng.nextInt(1000000).toDouble / 100))
      }
    }
    Seq(
      "empty" -> Seq.empty,
      "single row" -> Seq(7L -> Some(1.0)),
      "two rows" -> Seq(-3L -> None, 9L -> Some(2.0)),
      "uniform" -> gen(1, 200, 1L << 40),
      "clustered (empty buckets)" ->
        (gen(2, 80, 100) ++ gen(3, 80, 100).map { case (k, v) => (k + (1L << 50)) -> v }),
      "all null values" -> gen(4, 50, 1000).map { case (k, _) => k -> None },
      "negative heavy" -> gen(5, 120, 1L << 20).map { case (k, v) => (-math.abs(k), v) }
        .distinctBy(_._1)
    )
  }

  test("all five ops equal their single-partition formulations on " +
    "adversarial inputs") {
    cases.foreach { case (label, data) =>
      val df = data.toDF("k", "v")
      val w = Window.orderBy("k")

      def m(rows: Array[org.apache.spark.sql.Row]): Map[Long, Option[Any]] =
        rows.map(r => r.getLong(0) -> (Option(r.get(1)) match {
          // BigDecimal.equals is scale-sensitive; plan shapes differ in
          // result scale (0E-9 vs 0E-10) while the VALUES are exact
          case Some(d: java.math.BigDecimal) => Some(d.stripTrailingZeros)
          case other => other
        })).toMap

      // prefix sum (exclusive) — summed as decimals: double partial-sum
      // ORDER differs between the distributed and single-partition plans
      // (ULP-level drift), which is exactly why the engine's money sums
      // go through decimal partials (graft.queries.dsum)
      val dfd = df.withColumn("vd", col("v").cast("decimal(18,2)"))
      val naiveP = m(dfd.select(col("k"), coalesce(
        sum("vd").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0).cast("decimal(18,2)")).as("p")).collect())
      val scalP = m(ScalableWindow.prefixSumExclusive(dfd, Seq("k"), col("vd"), "p")
        .select("k", "p").collect())
      assert(scalP == naiveP, s"prefixSum / $label")

      // row number
      val naiveR = m(df.select(col("k"), row_number().over(w).as("rn")).collect())
      val scalR = m(ScalableWindow.rowNumber(df, Seq("k"), "rn")
        .select("k", "rn").collect())
      assert(scalR == naiveR, s"rowNumber / $label")

      // lag1 (null-gated carry)
      val naiveL = m(df.select(col("k"), lag("v", 1).over(w).as("p")).collect())
      val scalL = m(ScalableWindow.lag1(df, Seq("k"), "v", "p")
        .select("k", "p").collect())
      assert(scalL == naiveL, s"lag1 / $label")

      // lead1 with default — 3-arg lead: the default applies ONLY past
      // the end, an in-range null successor value stays null
      val naiveLd = m(df.select(col("k"),
        lead(col("v"), 1, -1.0).over(w).as("nx")).collect())
      val scalLd = m(ScalableWindow.lead1(df, Seq("k"), "v", "nx", lit(-1.0))
        .select("k", "nx").collect())
      assert(scalLd == naiveLd, s"lead1 / $label")

      // backward fill
      val naiveF = m(df.select(col("k"), first("v", ignoreNulls = true)
        .over(w.rowsBetween(0, Window.unboundedFollowing)).as("f")).collect())
      val scalF = m(ScalableWindow.fillBackward(df, Seq("k"), col("v"), "f")
        .select("k", "f").collect())
      assert(scalF == naiveF, s"fillBackward / $label")
    }
  }

  test("composite tie-heavy keys: rowNumber/prefixSum equal naive on " +
    "adversarial category spreads") {
    // leading key drawn from very few categories (incl. null and empty
    // string), uniqueness restored by the numeric tiebreaker — the
    // composite lexicographic boundaries must agree with the naive
    // two-column order everywhere
    val rng = new scala.util.Random(11)
    val cats = Seq(null, "", "a", "aa", "b", "z")
    Seq(
      "few cats" -> (0 until 400).map(i =>
        (cats(rng.nextInt(cats.length)), i.toLong,
          Some(rng.nextInt(100000).toDouble / 100))),
      "one cat" -> (0 until 100).map(i => ("only", i.toLong, Some(i / 100.0))),
      "all null cat" -> (0 until 60).map(i =>
        (null: String, i.toLong, Option.empty[Double]))
    ).foreach { case (label, data) =>
      val df = data.toDF("c", "k", "v")
        .withColumn("vd", col("v").cast("decimal(18,2)"))
      val w = Window.orderBy("c", "k")
      def m(rows: Array[org.apache.spark.sql.Row]): Map[Long, Any] =
        rows.map(r => r.getLong(0) -> (Option(r.get(1)) match {
          case Some(d: java.math.BigDecimal) => Some(d.stripTrailingZeros)
          case other => other
        })).toMap
      val naiveR = m(df.select(col("k"), row_number().over(w).as("rn")).collect())
      val scalR = m(ScalableWindow.rowNumber(df, Seq("c", "k"), "rn")
        .select("k", "rn").collect())
      assert(scalR == naiveR, s"rowNumber / $label")
      val naiveP = m(df.select(col("k"), coalesce(
        sum("vd").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0).cast("decimal(18,2)")).as("p")).collect())
      val scalP = m(ScalableWindow.prefixSumExclusive(df, Seq("c", "k"), col("vd"), "p")
        .select("k", "p").collect())
      assert(scalP == naiveP, s"prefixSum / $label")
    }
  }
}
