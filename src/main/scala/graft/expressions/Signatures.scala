package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as one native expression: given the array of 31-bit
  * base hashes of a document's shingles, produce the `k` permutation
  * minima in a single pass (hashes × lanes in a tight primitive loop).
  *
  * The equivalent `array(k × array_min(transform(...)))` formulation runs
  * interpreted — per-lane array traversals with boxed longs. Permutation
  * parameters are deterministic module constants shared with
  * [[graft.ops.DedupOps]] so the two formulations agree exactly.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val a = SignatureParams.A
    val b = SignatureParams.B
    val out = Array.fill(numHashes)(SignatureParams.Prime)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = (h * a(j) + b(j)) % SignatureParams.Prime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val params = classOf[SignatureParams].getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val a = ctx.freshName("pa")
      val b = ctx.freshName("pb")
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[$numHashes];
         |long[] $a = $params.A(); long[] $b = $params.B();
         |java.util.Arrays.fill($out, $params.Prime());
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($h * $a[$j] + $b[$j]) % $params.Prime();
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash from the token-hash array in one pass: per-bit ±1 votes
  * accumulated in a 64-slot counter array, sign-packed at the end. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val acc = ctx.freshName("acc")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $hs.numElements(); $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $acc = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $acc |= (1L << $b);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Count of tokens (occurrences, not types) from `child` — an
  * `array<string>` — that appear in the fixed `words` set, as one
  * codegen'd hash-probe loop.
  *
  * The HOF formulation `size(filter(toks, t => array_contains(sw, t)))`
  * is CodegenFallback: interpreted per row, with a linear `array_contains`
  * probe per token — and language-ID evaluates it once PER LANGUAGE
  * PROFILE. The word set is bound at plan time on the driver and shipped
  * through the codegen reference array. */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"stopword_hits expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var count = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwords", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $cnt = 0;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i) && $setRef.contains($arr.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): StopwordHits =
    copy(child = c)
  override def prettyName: String = "stopword_hits"
}

/** Count of positions where two `array<bigint>` signatures agree, as one
  * codegen'd primitive loop — the MinHash similarity estimator's kernel.
  *
  * The HOF formulation `aggregate(zip_with(a, b, eq), 0, +)` is
  * CodegenFallback: interpreted per row with boxed longs, and it runs on
  * EVERY LSH candidate pair — the hot inner loop of the band join at
  * corpus scale. Semantics match the HOF form for equal-length non-null
  * arrays (what signatures are by construction: fixed NumHashes lanes,
  * containsNull = false); a length mismatch counts only the shared
  * prefix, exactly as zip_with's null-padding contributed 0 there. */
case class SigMatchCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_match_count expects two array<bigint>, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  // A null LANE (containsNull arrays) contributes 0, matching the HOF
  // reference exactly: zip_with's `a = b` is null when either side is,
  // and the aggregate's `acc + when(eq, 1).otherwise(0)` coalesces that
  // to 0 — two null lanes must NOT count as a match (getLong on a null
  // lane reads 0 and would).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i) &&
         |      $x.getLong($i) == $y.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SigMatchCount = copy(left = l, right = r)
  override def prettyName: String = "sig_match_count"
}

/** Deterministic permutation parameters shared by the expression and the
  * HOF formulation (same xorshift stream as DedupOps.perms). */
class SignatureParams
object SignatureParams {
  val Prime: Long = 2147483647L
  val NumHashes: Int = 64
  private val ab: (Array[Long], Array[Long]) = {
    var s = 0x5DEECE66DL
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s & 0x7fffffffL }
    val a = new Array[Long](NumHashes)
    val b = new Array[Long](NumHashes)
    (0 until NumHashes).foreach { i => a(i) = (next() | 1L) % Prime; b(i) = next() % Prime }
    (a, b)
  }
  def A: Array[Long] = ab._1
  def B: Array[Long] = ab._2
}

object SignatureFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    // strict arity: silently ignoring extra arguments would let
    // `minhash_signature(hs, 32)` compute the 64-hash default while the
    // user believes they parameterized it
    def only(fn: String, children: Seq[Expression]): Expression = {
      if (children.length != 1) throw new IllegalArgumentException(
        s"$fn takes exactly 1 argument, got ${children.length}")
      children.head
    }
    val mh = FunctionIdentifier("minhash_signature")
    if (!registry.functionExists(mh)) {
      registry.registerFunction(mh,
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
        (children: Seq[Expression]) =>
          MinHashSignature(only("minhash_signature", children),
            SignatureParams.NumHashes))
    }
    val sh = FunctionIdentifier("simhash64")
    if (!registry.functionExists(sh)) {
      registry.registerFunction(sh,
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (children: Seq[Expression]) => SimHash64(only("simhash64", children)))
    }
    val th = FunctionIdentifier("token_hashes")
    if (!registry.functionExists(th)) {
      registry.registerFunction(th,
        new ExpressionInfo(classOf[TokenHashes].getName, "token_hashes"),
        (children: Seq[Expression]) => TokenHashes(only("token_hashes", children)))
    }
    // SQL forms take foldable literals for the non-column parameters:
    //   word_gram_hashes(toks, 3[, false]), stopword_hits(toks, array('the',...))
    def foldableArg(fn: String, children: Seq[Expression], i: Int,
                    what: String): Any = {
      if (children.length <= i) throw new IllegalArgumentException(
        s"$fn expects ${i + 1}+ arguments ($what missing)")
      val c = children(i)
      if (!c.foldable) throw new IllegalArgumentException(
        s"$fn argument ${i + 1} ($what) must be a foldable literal, got ${c.sql}")
      val v = c.eval(null)
      if (v == null) throw new IllegalArgumentException(
        s"$fn argument ${i + 1} ($what) must not be null")
      v
    }
    val wg = FunctionIdentifier("word_gram_hashes")
    if (!registry.functionExists(wg)) {
      registry.registerFunction(wg,
        new ExpressionInfo(classOf[WordGramHashes].getName, "word_gram_hashes"),
        (children: Seq[Expression]) => {
          val w = foldableArg("word_gram_hashes", children, 1, "gram width") match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"word_gram_hashes gram width must be integral, got $other")
          }
          val mp = children.length > 2 &&
            (foldableArg("word_gram_hashes", children, 2, "modPrime") match {
              case b: Boolean => b
              case other => throw new IllegalArgumentException(
                s"word_gram_hashes modPrime must be boolean, got $other")
            })
          WordGramHashes(children.head, w, mp)
        })
    }
    val sw = FunctionIdentifier("stopword_hits")
    if (!registry.functionExists(sw)) {
      registry.registerFunction(sw,
        new ExpressionInfo(classOf[StopwordHits].getName, "stopword_hits"),
        (children: Seq[Expression]) => {
          val words = foldableArg("stopword_hits", children, 1, "word list") match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              a.toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
                .toSeq.collect { case s if s != null => s.toString }
            case other => throw new IllegalArgumentException(
              s"stopword_hits word list must be an array literal, got $other")
          }
          StopwordHits(children.head, words)
        })
    }
  }
}
