package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane sign signature, codegen'd: bit i of the result is the
  * sign of ⟨v, planeᵢ⟩. The plane matrix rides along as a flattened
  * reference object (row-major, numPlanes × dim), so one primitive
  * dim×planes loop replaces `numPlanes` interpreted higher-order dot
  * products (~3 ms/row → µs/row; the difference between an ANN index
  * build that scales and one that doesn't). */
case class LshSign(child: Expression, planesFlat: Array[Double], dim: Int)
    extends UnaryExpression {

  require(dim >= 1, s"lsh_sign: dim must be positive, got $dim")
  require(planesFlat.length % dim == 0,
    s"lsh_sign: planesFlat length ${planesFlat.length} is not a multiple " +
      s"of dim $dim — a remainder plane would be silently dropped")
  require(planesFlat.length / dim <= 64,
    s"lsh_sign: ${planesFlat.length / dim} planes exceed the 64-bit " +
      "signature — (1L << p) would wrap and alias sign bits")

  private def numPlanes: Int = planesFlat.length / dim

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sign expects array<float|double>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var d = 0.0
      var i = 0
      val base = p * dim
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        d += x * planesFlat(base + i)
        i += 1
      }
      if (d > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesFlat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long $sig = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $d = 0.0; int $base = $p * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $d += ((double) $v.$get($i)) * $planesRef[$base + $i];
         |  }
         |  if ($d > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): LshSign =
    copy(child = c)
  override def prettyName: String = "lsh_sign"
}
