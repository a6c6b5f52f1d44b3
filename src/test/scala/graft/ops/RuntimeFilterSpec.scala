package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[RuntimeFilterOps]] — the gate query (j6_bloom_join) proves the
  * pruned join's RESULT equals the plain join; this spec proves the prune
  * itself behaves like a runtime filter should: no false negatives ever,
  * a real reduction on a selective dim, and a codegen'd predicate (no
  * UDF) in the fact-side plan. */
class RuntimeFilterSpec extends SparkTestBase {

  private def orders = spark.read.parquet(s"$sfSmall/orders.parquet")
  private def dim = spark.read.parquet(s"$sfSmall/customer.parquet")
    .filter(col("c_mktsegment") === "BUILDING")
    .select("c_custkey")

  test("bloom prune keeps every joining row (no false negatives)") {
    val pruned = RuntimeFilterOps.bloomPrune(
      orders, "o_custkey", dim, "c_custkey",
      expectedItems = 1L << 14, numBits = 1L << 18)
    val joinedFromPruned = pruned
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val joinedPlain = orders
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(joinedFromPruned == joinedPlain)
  }

  test("bloom prune actually reduces a selective fact side") {
    val total = orders.count()
    val prunedN = RuntimeFilterOps.bloomPrune(
      orders, "o_custkey", dim, "c_custkey",
      expectedItems = 1L << 14, numBits = 1L << 18).count()
    val trueMatch = orders
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    // BUILDING is ~1/5 of customers: the prune must bite, and it can never
    // undershoot the true match count (bloom ⊇ exact)
    assert(prunedN >= trueMatch, "bloom can never drop a joining row")
    assert(prunedN < total * 6 / 10,
      s"prune should remove a large fraction: kept $prunedN of $total")
  }

  test("might_contain is a plain codegen predicate in the filter") {
    val pruned = RuntimeFilterOps.bloomPrune(
      orders, "o_custkey", dim, "c_custkey",
      expectedItems = 1L << 14, numBits = 1L << 18)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("UDF"), s"no UDF in the prune path:\n$plan")
  }
}
