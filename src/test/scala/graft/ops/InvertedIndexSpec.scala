package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[InvertedIndexOps]] — the gate (text_search) hash-compares search
  * results through a real build+append against brute-force containment;
  * this spec pins the pruning claim (a k-term query reads only those
  * terms' buckets) and append visibility. */
class InvertedIndexSpec extends SparkTestBase {

  private lazy val docs = graft.queries.t(spark, sfTiny, "documents")

  test("search equals brute-force containment; appended docs are found") {
    val base = Files.createTempDirectory("tidx").toString
    val store = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val delta = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    InvertedIndexOps.writeTextIndex(store, spark, "tidx_spec", base)
    val terms = Seq("batch", "scan")
    def brute(d: org.apache.spark.sql.DataFrame) = d
      .filter(terms.map(t =>
        array_contains(DedupOps.tokens(col("text")), t)).reduce(_ && _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val beforeAppend = InvertedIndexOps
      .searchAllTerms(spark, "tidx_spec", terms)
      .collect().map(_.getLong(0)).toSet
    assert(beforeAppend == brute(store))
    InvertedIndexOps.appendToTextIndex(delta, spark, "tidx_spec")
    val afterAppend = InvertedIndexOps
      .searchAllTerms(spark, "tidx_spec", terms)
      .collect().map(_.getLong(0)).toSet
    assert(afterAppend == brute(docs),
      "append must make new docs searchable without a rebuild")
    assert((afterAppend -- beforeAppend).nonEmpty,
      "fixture must add matching docs in the delta")
  }

  test("a k-term query scans only the terms' buckets") {
    val base = Files.createTempDirectory("tidx-prune").toString
    InvertedIndexOps.writeTextIndex(docs, spark, "tidx_prune", base,
      nBuckets = 16)
    val df = InvertedIndexOps.searchAllTerms(
      spark, "tidx_prune", Seq("batch", "scan", "hash"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"scan must be bucket-pruned:\n$plan")
    assert(m.get.group(1).toInt <= 3 && m.get.group(2).toInt == 16,
      s"3 terms must select <= 3 of 16 buckets: ${m.get.matched}")
  }
}
