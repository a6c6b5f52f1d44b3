package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase global-window ops must agree exactly with the naive
  * single-partition Window plans they replace. */
class ScalableWindowSpec extends SparkTestBase {

  private lazy val orders = spark.read.parquet(s"$sfSmall/orders.parquet")
    .select("o_orderkey", "o_totalprice")

  test("prefixSumExclusive equals the single-partition running sum") {
    val naive = orders
      .select(col("o_orderkey"),
        coalesce(sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(Window.orderBy("o_orderkey")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0))
          .cast("double").as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scalable = ScalableWindow.prefixSumExclusive(
      orders.select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("v")),
      Seq("o_orderkey"), col("v"), "p")
      .select(col("o_orderkey"), col("p").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scalable == naive)
  }

  test("rowNumber equals the single-partition row_number") {
    val naive = orders
      .select(col("o_orderkey"),
        row_number().over(Window.orderBy("o_orderkey")).as("rn"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val scalable = ScalableWindow.rowNumber(
      orders.select("o_orderkey"), Seq("o_orderkey"), "rn")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(scalable == naive)
  }

  test("lag1/lead1 equal the single-partition lag/lead incl. boundaries") {
    val naiveLag = orders
      .select(col("o_orderkey"),
        lag("o_totalprice", 1).over(Window.orderBy("o_orderkey")).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val scalLag = ScalableWindow.lag1(orders, Seq("o_orderkey"),
      "o_totalprice", "v")
      .select("o_orderkey", "v")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(scalLag == naiveLag)

    val naiveLead = orders
      .select(col("o_orderkey"),
        coalesce(lead("o_totalprice", 1).over(Window.orderBy("o_orderkey")),
          lit(-1.0)).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val scalLead = ScalableWindow.lead1(orders, Seq("o_orderkey"),
      "o_totalprice", "v", lit(-1.0))
      .select("o_orderkey", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scalLead == naiveLead)
  }

  test("the plan has no partition-less Window") {
    val df = ScalableWindow.rowNumber(
      orders.select("o_orderkey"), Seq("o_orderkey"), "rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    // a partitioned window spec lists the partition expression before ORDER
    assert(!plan.contains("windowspecdefinition(o_orderkey ASC"),
      "window must be partitioned by the range-partition id")
  }
}
