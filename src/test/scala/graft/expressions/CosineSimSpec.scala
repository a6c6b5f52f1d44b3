package graft.expressions

import graft.SparkTestBase
import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

class CosineSimSpec extends SparkTestBase {
  import spark.implicits._

  test("codegen'd cosine_sim matches the HOF reference bit-for-bit") {
    val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val pairs = a.crossJoin(b).filter($"ia" < $"ib").limit(5000)
    val diff = pairs
      .withColumn("fast",
        SimilarityOps.cosineFast(spark, $"va", $"vb"))
      .withColumn("ref", SimilarityOps.cosine($"va", $"vb"))
      .filter($"fast" =!= $"ref") // bit-exact: same order of operations
      .count()
    assert(diff == 0)
  }

  test("cosine_sim handles double arrays and SQL registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    // orthogonal
    val o = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 3.0D)) c").head()
    assert(o.getDouble(0) == 0.0)
  }

  test("the plan stays in whole-stage codegen") {
    val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")
    val df = emb.select(
      SimilarityOps.cosineFast(spark, $"embedding", $"embedding").as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan rendering
    assert(plan.contains("*(1) Project [cosine_sim"))
  }
}
