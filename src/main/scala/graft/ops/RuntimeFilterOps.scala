package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Explicit runtime-filter (bloom) join pruning.
  *
  * The dominant cost of a selective fact⋈dim join at 100 TB is not the
  * join itself but shipping every fact row to the shuffle only for most
  * of them to find no partner. Spark's own `InjectRuntimeFilter` rule
  * closes that gap opportunistically; this op is the same mechanism made
  * explicit and deterministic: build ONE bloom filter over the dim keys
  * (a fixed-size sketch, built by partial aggregation — bytes shipped are
  * `numBits/8` per partition, independent of dim row count), collect that
  * single sketch to the driver, and push `might_contain` into the fact
  * scan's filter so non-joining rows die before the exchange.
  *
  * Exactness is unconditional: a bloom has false positives but no false
  * negatives, and the real join still runs after the prune — so the
  * result equals the unpruned join and the same SQL oracle applies. The
  * sketch uses the codegen'd `XxHash64`/`BloomFilterMightContain`
  * expressions (no UDF, stays inside whole-stage codegen).
  *
  * Reference analogue: spark-bam filters whole files/intervals before
  * loading (CanLoadBam.scala:120-140 path pruning); this is the same
  * "drop work before it moves" idea at row granularity.
  */
object RuntimeFilterOps {

  /** Bloom sketch of `dim`'s `key` column as one driver-side byte array. */
  def buildBloom(dim: DataFrame, key: String,
                 expectedItems: Long = 1L << 20,
                 numBits: Long = 1L << 23): Array[Byte] = {
    val hashed = new XxHash64(Seq(GraftColumnBridge.expression(col(key))))
    val agg = new BloomFilterAggregate(
      hashed, Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = dim.select(GraftColumnBridge.column(agg).as("bf")).head()
    row.getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` as a pushable Column predicate. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftColumnBridge.expression(key)))))

  /** Prune `fact` to rows whose `factKey` might join `dim`'s `dimKey`,
    * then the caller joins exactly as before. `dim` should already carry
    * its selective predicates — the bloom is built on the post-filter
    * keys, which is what makes the prune bite.
    */
  def bloomPrune(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 expectedItems: Long = 1L << 20,
                 numBits: Long = 1L << 23): DataFrame =
    fact.filter(mightContain(buildBloom(dim, dimKey, expectedItems, numBits),
      col(factKey)))
}
