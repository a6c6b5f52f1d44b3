package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark session extensions for the graft engine: plug-in registration of
  * the physical-plan rules (and a single place to grow strategies /
  * optimizer rules). Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — all graft
  * entry points (Bench / Verify / tests) do; an externally-built session
  * without it stays correct, just without the shuffle eliminations.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectQueryStagePrepRule(_ => graft.plans.PidShuffleElimination())
  }
}
