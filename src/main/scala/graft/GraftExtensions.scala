package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSim, MinHashSignature, SignatureParams, SimHash64}

/** Spark session extensions for the graft engine: plug-in registration of
  * the physical-plan rules and the native SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — all graft
  * entry points (Bench / Verify / tests) do; an externally-built session
  * without it stays correct (the ops call the runtime `register()`
  * fallbacks), just without the shuffle eliminations and without
  * `cosine_sim`/`minhash_signature`/`simhash64` in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectQueryStagePrepRule(_ => graft.plans.PidShuffleElimination())
    // materialized-view matching: serve registered rollup stores in
    // place of fact-table aggregate scans (AggStoreRegistry.register)
    ext.injectOptimizerRule(spark => graft.plans.AggStoreRewrite(spark))
    // flags-bit predicates (no V1 Filter form) → BAM scan decode-skip hint
    ext.injectOptimizerRule(spark => graft.plans.BamBitFilterPushdown(spark))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) =>
        MinHashSignature(children.head, SignatureParams.NumHashes)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    // HDR-sketch quantile aggregate (store-servable via AggStoreRewrite)
    ext.injectFunction((FunctionIdentifier("hdr_percentile"),
      new ExpressionInfo(classOf[graft.expressions.HdrPercentile].getName,
        "hdr_percentile"),
      (children: Seq[Expression]) =>
        graft.expressions.HdrPercentile.fromArgs(children)))
  }
}
