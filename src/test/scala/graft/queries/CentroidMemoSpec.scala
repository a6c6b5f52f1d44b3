package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.SparkSession

/** Growth bounds of the IVF centroid memo behind `ann_ivf_cached`:
  * entries are per-SESSION-OBJECT (identity keys), never per call, so the
  * memo is bounded by the number of live sessions × sf dirs. (Stopped
  * sessions are evicted on access; that branch needs a stopped
  * SparkContext, which the shared test JVM can't produce — the bound
  * tested here is the one that holds while sessions are alive.) */
class CentroidMemoSpec extends SparkTestBase {

  private def run(s: SparkSession): Unit =
    SparkEntry.queries("ann_ivf_cached")(s, sfTiny).collect()

  test("centroid memo: per-session identity entries, no per-call growth") {
    run(spark)
    val base = PipelineOps.centroidMemoSessions
    run(spark); run(spark)
    assert(PipelineOps.centroidMemoSessions == base,
      "repeat calls on one session must not add entries")
    val s2 = spark.newSession() // distinct object, same live context
    run(s2)
    assert(PipelineOps.centroidMemoSessions == base + 1,
      "a second session gets exactly one identity-keyed entry")
    run(s2); run(spark)
    assert(PipelineOps.centroidMemoSessions == base + 1,
      "growth is per live session, not per call")
  }
}
