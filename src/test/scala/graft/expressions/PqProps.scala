package graft.expressions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Differential properties for the PQ kernels' arithmetic seams — the
  * contracts every PQ oracle twin silently depends on. */
class PqProps extends SparkTestBase {
  import spark.implicits._

  test("Pq.quantize equals Spark's round(x*1e6) on adversarial values") {
    // exact .5 fixed points (away-from-zero ties), negatives, subnormal-
    // small, and seeded-random float-derived values: if the Scala-side
    // quantizer ever drifted from functions.round (≡ DuckDB ROUND, the
    // proven convention), code assignment would diverge from the oracle
    // only on tie-straddling data — a silent, data-dependent red hash
    val rng = new scala.util.Random(20260815L)
    val adversarial = Seq(
      0.0, -0.0, 2.5e-6, -2.5e-6, 0.5e-6, -0.5e-6, 1.0, -1.0,
      1.9999995, -1.9999995, 3.5e-6, -3.5e-6)
    val vals = adversarial ++
      Seq.fill(2000)(((rng.nextFloat() - 0.5f) * 8f).toDouble)
    val viaSpark = vals.toDF("x")
      .select(round(col("x") * 1e6).cast("long").as("q"))
      .collect().map(_.getLong(0)).toSeq
    val viaScala = vals.map(Pq.quantize)
    assert(viaScala == viaSpark,
      vals.zip(viaScala.zip(viaSpark)).filter { case (_, (a, b)) => a != b }
        .take(5).toString)
  }

  test("degenerate norms score NULL, never NaN/Inf; malformed inputs " +
    "are NULL under non-nullable children") {
    val bridge = org.apache.spark.sql.GraftColumnBridge
    val dim = 8; val m = 2
    // codebook whose code 0 is the all-zero codeword in both sub-spaces
    val cb: Array[Array[Array[Float]]] =
      Array.fill(m)(Array(Array.fill(dim / m)(0f), Array.fill(dim / m)(1f)))
    val n2 = cb.map(_.map(cw => cw.map(x => x.toDouble * x).sum))
    def adc(codes: Seq[Int], q: Seq[Double], qn: Double) = {
      val lut = bridge.column(graft.expressions.PqLut(
        bridge.expression(typedLit(q)), cb))
      Seq(1).toDF("one").select(bridge.column(graft.expressions.PqAdcCosine(
        bridge.expression(typedLit(codes)),
        bridge.expression(lut),
        bridge.expression(lit(qn)), n2)).as("cos")).head()
    }
    // zero query norm and all-zero-codeword candidates: NULL, not NaN
    assert(adc(Seq(1, 1), Seq.fill(dim)(0.0), 0.0).isNullAt(0),
      "zero query norm must score NULL")
    assert(adc(Seq(0, 0), Seq.fill(dim)(1.0), math.sqrt(dim)).isNullAt(0),
      "all-zero codewords must score NULL")
    assert(!adc(Seq(1, 1), Seq.fill(dim)(1.0), math.sqrt(dim)).isNullAt(0))
    // the expressions DECLARE nullability even under non-nullable
    // children (built via typedLit/transform — never null), because
    // malformed input yields NULL: a false nullable=false here lets the
    // optimizer prune the null branch and miscompile downstream
    val codesExpr = graft.expressions.PqCodes(
      bridge.expression(typedLit(Seq.fill(dim)(1.0))),
      graft.expressions.Pq.quantizeCodebook(cb))
    val recExpr = graft.expressions.PqReconstruct(
      bridge.expression(typedLit(Seq(0, 1))), cb)
    val lutExpr = graft.expressions.PqLut(
      bridge.expression(typedLit(Seq.fill(dim)(1.0))), cb)
    assert(codesExpr.nullable && recExpr.nullable && lutExpr.nullable,
      "PQ expressions must declare nullable=true regardless of children")
    // and a wrong-length embedding really does come back NULL
    val short = Seq(1).toDF("one").select(bridge.column(
      graft.expressions.PqCodes(
        bridge.expression(typedLit(Seq(1.0, 2.0))),
        graft.expressions.Pq.quantizeCodebook(cb))).as("c")).head()
    assert(short.isNullAt(0), "wrong-length input must encode to NULL")
  }

  test("encode→decode→re-encode is a fixed point on random codebooks") {
    val rng = new scala.util.Random(7L)
    val dim = 16; val m = 4; val ksub = 8
    val vecs = Seq.tabulate(300)(i =>
      (i.toLong, Array.fill(dim)((rng.nextFloat() - 0.5f) * 4f).toSeq))
      .toDF("vec_id", "embedding")
    val cb = graft.ops.SimilarityOps.pqCodebooks(vecs, dim, m, ksub)
    val codes = graft.ops.SimilarityOps.pqEncode(vecs, cb)
    val re = graft.ops.SimilarityOps.pqEncode(
      graft.ops.SimilarityOps.pqDecode(codes, cb), cb)
    val diff = codes.withColumnRenamed("codes", "c1")
      .join(re.withColumnRenamed("codes", "c2"), "vec_id")
      .filter(col("c1") =!= col("c2")).count()
    assert(diff == 0, s"$diff of 300 vectors changed codes on re-encode")
  }
}
