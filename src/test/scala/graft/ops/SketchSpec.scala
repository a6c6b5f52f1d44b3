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
}
