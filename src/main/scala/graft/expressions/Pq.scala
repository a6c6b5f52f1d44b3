package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels: encode an embedding to `m` sub-space
  * codebook indices, and reconstruct the (lossy) embedding from them.
  *
  * The codebook rides each expression as ONE reference object (the
  * RangeBucket lesson: literal-tree encodings of driver-side tables
  * explode plan size and Janino time), and the per-row work is a tight
  * primitive loop under WholeStageCodegen.
  *
  * Encoding distances are EXACT INTEGER L2 over fixed-point quantized
  * coordinates (`round(x·10⁶)` as long — the ann_ivf_q convention):
  * argmin over exact integers is associativity-free, so code
  * assignment is bit-replicable in any engine, which is what lets the
  * driver gate hash-compare the whole encode→decode cycle
  * (`ann_pq_q`). A float-L2 argmin would tie-break on last-ulp
  * summation order and be replicable in nothing.
  */
object Pq {

  /** `round(x·10⁶)` with HALF AWAY FROM ZERO ties — the semantics of
    * both Spark's `functions.round` and DuckDB's `ROUND`, which the
    * existing quantized gate queries already prove agree. */
  def quantize(x: Double): Long = {
    val s = x * 1e6
    if (s >= 0) math.floor(s + 0.5d).toLong else math.ceil(s - 0.5d).toLong
  }

  /** Float codebook (m × ksub × dsub) → its fixed-point twin. */
  def quantizeCodebook(cb: Array[Array[Array[Float]]]): Array[Array[Array[Long]]] =
    cb.map(_.map(_.map(f => quantize(f.toDouble))))
}

/** `pq_codes(vec)` → `array<int>` of `m` codebook indices: per
  * sub-space, the code minimizing exact integer L2 to the quantized
  * sub-vector, ties to the LOWEST code. Input length must be
  * `m · dsub`; a short/corrupt embedding yields NULL (same stance as
  * [[CosineSim]] — truncation would silently mis-encode).
  *
  * An `array<long>` input is taken as ALREADY-quantized fixed-point
  * coordinates (the residual-PQ path: residuals are exact integers by
  * construction, so re-quantizing would be a lossy no-op). */
case class PqCodes(child: Expression, qcb: Array[Array[Array[Long]]])
    extends UnaryExpression {

  private val m = qcb.length
  private val ksub = qcb.head.length
  private val dsub = qcb.head.head.length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // malformed (wrong-length) input yields NULL even under a non-nullable
  // child, so the default child.nullable inheritance would lie to the
  // optimizer (pruned IsNotNull over a value that CAN be null)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects array<float|double|long>, got ${other.simpleString}")
  }

  // 0 = float (quantize), 1 = double (quantize), 2 = long (verbatim)
  @transient private lazy val elemKind =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => 0
      case DoubleType => 1
      case LongType => 2
    }

  /** Public so generated code can call it; null on wrong length. */
  def encode(a: ArrayData): Any = {
    if (a.numElements() != m * dsub) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = qcb(s)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < ksub) {
        val cw = cb(c)
        var d2 = 0L
        var d = 0
        while (d < dsub) {
          val q = elemKind match {
            case 0 => Pq.quantize(a.getFloat(s * dsub + d).toDouble)
            case 1 => Pq.quantize(a.getDouble(s * dsub + d))
            case _ => a.getLong(s * dsub + d)
          }
          val diff = q - cw(d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c } // strict <: ties keep lowest
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("enc")
      s"""
         |Object $tmp = $ref.encode($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
  override def prettyName: String = "pq_codes"
}

/** `pq_reconstruct(codes)` → `array<float>`: concatenation of the `m`
  * selected codewords — the lossy decode of [[PqCodes]]. The output
  * elements are VERBATIM codebook floats (no arithmetic), so decode is
  * trivially bit-replicable. Out-of-range or wrong-arity codes yield
  * NULL rather than a silently wrong vector. */
case class PqReconstruct(child: Expression, cb: Array[Array[Array[Float]]])
    extends UnaryExpression {

  private val m = cb.length
  private val ksub = cb.head.length
  private val dsub = cb.head.head.length

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  // out-of-range/wrong-arity codes yield NULL regardless of child.nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_reconstruct expects array<int>, got ${other.simpleString}")
  }

  /** Public so generated code can call it. */
  def decode(a: ArrayData): Any = {
    if (a.numElements() != m) return null
    val out = new Array[Float](m * dsub)
    var s = 0
    while (s < m) {
      val c = a.getInt(s)
      if (c < 0 || c >= ksub) return null
      val cw = cb(s)(c)
      System.arraycopy(cw, 0, out, s * dsub, dsub)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqRec", this, classOf[PqReconstruct].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("dec")
      s"""
         |Object $tmp = $ref.decode($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconstruct =
    copy(child = newChild)
  override def prettyName: String = "pq_reconstruct"
}

/** `pq_reconstruct_long(codes)` → `array<long>`: the fixed-point twin
  * of [[PqReconstruct]] for INTEGER codebooks (residual PQ): the output
  * elements are VERBATIM codeword longs, so the decode — and anything
  * summed onto it, like the cell centroid the residual was taken
  * against — stays exact-integer end to end. Out-of-range or
  * wrong-arity codes yield NULL. */
case class PqReconstructLong(child: Expression, qcb: Array[Array[Array[Long]]])
    extends UnaryExpression {

  private val m = qcb.length
  private val ksub = qcb.head.length
  private val dsub = qcb.head.head.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // out-of-range/wrong-arity codes yield NULL regardless of child.nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_reconstruct_long expects array<int>, got ${other.simpleString}")
  }

  /** Public so generated code can call it. */
  def decode(a: ArrayData): Any = {
    if (a.numElements() != m) return null
    val out = new Array[Long](m * dsub)
    var s = 0
    while (s < m) {
      val c = a.getInt(s)
      if (c < 0 || c >= ksub) return null
      System.arraycopy(qcb(s)(c), 0, out, s * dsub, dsub)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqRecL", this, classOf[PqReconstructLong].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("decl")
      s"""
         |Object $tmp = $ref.decode($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconstructLong =
    copy(child = newChild)
  override def prettyName: String = "pq_reconstruct_long"
}

/** `pq_lut(query_vec)` → `array<double>` of `m·ksub` dot products:
  * lut[s·ksub+c] = query-sub(s) · codeword(s,c). Built ONCE per query
  * row (m·ksub·dsub = one pass over the codebook); every corpus
  * candidate is then scored from it by [[PqAdcCosine]] in m adds. */
case class PqLut(child: Expression, cb: Array[Array[Array[Float]]])
    extends UnaryExpression {

  private val m = cb.length
  private val ksub = cb.head.length
  private val dsub = cb.head.head.length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // wrong-length query yields NULL regardless of child.nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects array<float|double>, got ${other.simpleString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Public so generated code can call it; null on wrong length. */
  def build(a: ArrayData): Any = {
    if (a.numElements() != m * dsub) return null
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val cw = cb(s)(c)
        var dot = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (isFloat) a.getFloat(s * dsub + d).toDouble
                  else a.getDouble(s * dsub + d)
          dot += x * cw(d).toDouble
          d += 1
        }
        out(s * ksub + c) = dot
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("lut")
      s"""
         |Object $tmp = $ref.build($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

/** `pq_adc_cosine(codes, lut, qnorm)` → double: asymmetric-distance
  * cosine between a RAW query and a PQ-encoded item, touching only the
  * item's `m` byte-sized codes. `lut` is the query's dot-product
  * lookup table (`m·ksub` doubles: lut[s·ksub+c] = q_sub(s)·codeword
  * (s,c), built once per query); the codeword norm² table rides as a
  * reference object (query-independent). cos = Σ lut[code] /
  * (qnorm · √Σ n2[code]) — the corpus pass never materializes a
  * reconstructed vector, which is the whole point of ADC at 100 TB:
  * per-candidate work is m adds + one divide, and the scan reads
  * 8 bytes/vector instead of 256. */
case class PqAdcCosine(codes: Expression, lut: Expression, qnorm: Expression,
                       n2: Array[Array[Double]])
    extends Expression {

  private val m = n2.length
  private val ksub = n2.head.length

  override def children: Seq[Expression] = Seq(codes, lut, qnorm)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, lut.dataType, qnorm.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_cosine expects (array<int>, array<double>, double), got $other")
    }

  /** Public so generated code can call it. */
  def score(cs: ArrayData, lt: ArrayData, qn: Double): Any = {
    if (cs.numElements() != m || lt.numElements() != m * ksub) return null
    var dot = 0.0
    var nn = 0.0
    var s = 0
    while (s < m) {
      val c = cs.getInt(s)
      if (c < 0 || c >= ksub) return null
      dot += lt.getDouble(s * ksub + c)
      nn += n2(s)(c)
      s += 1
    }
    // degenerate norms (zero query, all-zero codewords) are NULL, not
    // NaN/±Inf — the CosineSim stance; a NaN here would poison round()
    // and the top-k ordering downstream
    if (qn == 0.0 || nn == 0.0) null
    else dot / (qn * math.sqrt(nn))
  }

  override def eval(input: InternalRow): Any = {
    val c = codes.eval(input)
    val l = lut.eval(input)
    val q = qnorm.eval(input)
    if (c == null || l == null || q == null) null
    else score(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData],
      q.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcCosine].getName)
    val cG = codes.genCode(ctx)
    val lG = lut.genCode(ctx)
    val qG = qnorm.genCode(ctx)
    val tmp = ctx.freshName("adc")
    val childCode = Seq(cG, lG, qG).map(_.code.toString).mkString("\n")
    ev.copy(code = code"""
      |$childCode
      |boolean ${ev.isNull} = true;
      |double ${ev.value} = 0.0;
      |if (!${cG.isNull} && !${lG.isNull} && !${qG.isNull}) {
      |  Object $tmp = $ref.score(${cG.value}, ${lG.value}, ${qG.value});
      |  if ($tmp != null) {
      |    ${ev.isNull} = false;
      |    ${ev.value} = ((java.lang.Double) $tmp).doubleValue();
      |  }
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqAdcCosine =
    copy(codes = newChildren(0), lut = newChildren(1), qnorm = newChildren(2))
  override def prettyName: String = "pq_adc_cosine"
}
