package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `rademacher_project(vec)` → `array<long>`: Johnson-Lindenstrauss
  * dimensionality reduction with a ±1 (Rademacher) sign matrix —
  * y_j = Σ_i s(j,i) · quantize(x_i), the signs riding along as one
  * flattened row-major reference object (outDim × dim), the same
  * carry-the-matrix shape as [[LshSign]].
  *
  * EXACT INTEGER OUTPUT is the point: inputs quantize through
  * [[Pq.quantize]] (the half-away ×10⁶ fixed-point convention Spark's
  * `round` and DuckDB's `ROUND` both implement), and each output
  * coordinate is a ±sum of those longs — associativity-free, so the
  * projection is bit-replicable in any engine at any partitioning
  * (the oracle-able-kernel move applied to dim reduction). Cosine is
  * scale-invariant, so the ×10⁶ factor never needs undoing downstream.
  *
  * Rademacher signs satisfy the JL lemma with the same constants as
  * Gaussian planes (Achlioptas 2003, public literature) — this is the
  * database-friendly projection, not an approximation of one. */
case class RademacherProject(child: Expression, signsFlat: Array[Byte],
                             dim: Int)
    extends UnaryExpression {

  require(dim >= 1, s"rademacher_project: dim must be positive, got $dim")
  require(signsFlat.length % dim == 0,
    s"rademacher_project: signs length ${signsFlat.length} is not a " +
      s"multiple of dim $dim — a remainder row would be silently dropped")
  require(signsFlat.forall(s => s == 1 || s == -1),
    "rademacher_project: signs must be +1/-1")

  private def outDim: Int = signsFlat.length / dim

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rademacher_project expects array<float|double>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      q(i) = Pq.quantize(x)
      i += 1
    }
    val y = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0L
      val base = j * dim
      var k = 0
      while (k < n) { acc += signsFlat(base + k) * q(k); k += 1 }
      y(j) = acc
      j += 1
    }
    new GenericArrayData(y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signsFlat, "byte[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long[] $q = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $s = ((double) $v.$get($i)) * 1e6;
         |  $q[$i] = $s >= 0 ? (long) java.lang.Math.floor($s + 0.5d)
         |                   : (long) java.lang.Math.ceil($s - 0.5d);
         |}
         |long[] $y = new long[$outDim];
         |for (int $j = 0; $j < $outDim; $j++) {
         |  long $acc = 0L; int $base = $j * $dim;
         |  for (int $k = 0; $k < $n; $k++) {
         |    $acc += $signsRef[$base + $k] * $q[$k];
         |  }
         |  $y[$j] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($y);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): RademacherProject =
    copy(child = c)
  override def prettyName: String = "rademacher_project"
}
