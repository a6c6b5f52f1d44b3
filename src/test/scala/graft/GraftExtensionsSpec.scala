package graft

/** The session extension must make the native functions usable straight
  * from SQL — no runtime register() call — in any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (as the shared test
  * session is). */
class GraftExtensionsSpec extends SparkTestBase {

  test("native functions resolve in plain SQL via the extension") {
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    // both signature functions take pre-hashed token arrays
    val sig = spark.sql(
      "SELECT minhash_signature(array(xxhash64('a'), xxhash64('b'))) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == graft.expressions.SignatureParams.NumHashes)
    val q = "SELECT simhash64(array(xxhash64('a'), xxhash64('b'))) AS h"
    assert(spark.sql(q).head().getLong(0) == spark.sql(q).head().getLong(0))
  }

  test("the pid-shuffle rule is active in the extended session") {
    import org.apache.spark.sql.functions._
    val df = graft.ops.ScalableWindow.rowNumber(
      spark.range(1000).toDF("id"), Seq("id"), "rn")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning(__swpid"), p)
  }
}
