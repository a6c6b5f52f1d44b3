package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** HdrHistogram-style quantile as a NATIVE Catalyst aggregate — the
  * query-facing twin of [[graft.ops.SketchOps.hdrQuantiles]]'s table
  * walk, and the aggregate the [[graft.plans.AggStoreRewrite]] rule can
  * serve from a maintained rollup store.
  *
  * Semantics (deterministic, engine-replicable integer arithmetic —
  * no interpolation): bucket every value with
  * [[graft.ops.SketchOps.hdrBucket]]'s formula (keep the top
  * `subBits + 1` significant bits; negatives mirror on |v|), then
  * return the smallest bucket lower bound whose cumulative count
  * reaches the requested rank: `cum * 10000 >= total * pBp` with the
  * percentile expressed in basis points. `p = 0.5/0.9/0.99` therefore
  * matches `hdrQuantilesFromTable`'s p50/p90/p99 columns exactly.
  *
  * The buffer is the sketch itself — a bucket → count map bounded by
  * 2·64·2^subBits entries (each sign side) regardless of input size — so
  * partial
  * aggregation, merge, and the two-level hash aggregate all carry
  * O(buckets) state, never values. The optional `weight` child folds
  * PRE-BUCKETED (bucket, count) rows — the rollup-store serving path —
  * which is exact because the bucket function is idempotent on its own
  * lower bounds.
  */
case class HdrPercentile(
    value: Expression,
    weight: Expression,
    pBp: Int,
    subBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  require(pBp >= 0 && pBp <= 10000, s"percentile basis points out of range: $pBp")
  require(subBits >= 0 && subBits <= 20, s"subBits out of range: $subBits")

  override def children: Seq[Expression] = Seq(value, weight)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "hdr_percentile"

  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, weight.dataType) match {
      case (LongType | IntegerType | ShortType | ByteType,
            LongType | IntegerType | ShortType | ByteType) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, w) => TypeCheckResult.TypeCheckFailure(
        s"hdr_percentile expects integral (value, weight), got ($v, $w) — " +
          "scale and cast first (e.g. round(value * 100).cast('long'))")
    }

  /** Same arithmetic as SketchOps.hdrBucket's Column form: exponent from
    * the bit length (never floating log2), low bits below the top
    * `subBits + 1` cleared. Negatives MIRROR the positive bucketing on
    * |v| (bucket bound toward zero) — a raw pass-through would give every
    * distinct negative its own map entry, unbounding the per-group
    * buffer on a negative-heavy column. `Long.MinValue` (whose |v| is
    * unrepresentable) is its own bucket — the same value the Column
    * form's two's-complement arithmetic lands on. */
  private def bucket(v: Long): Long =
    if (v == 0L) 0L
    else if (v == Long.MinValue) Long.MinValue
    else if (v < 0) -bucketPos(-v)
    else bucketPos(v)

  private def bucketPos(v: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val w = 1L << math.max(0, e - subBits)
    v - (v % w)
  }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case LongType => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case ByteType => v.asInstanceOf[Byte].toLong
    case other => throw new IllegalStateException(s"non-integral $other")
  }

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long],
                      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = value.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null) {
        val wl = asLong(weight, w)
        if (wl != 0) buf.merge(bucket(asLong(value, v)), wl, (a, b) => a + b)
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[Long, Long],
                     other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    other.forEach((b, n) => buf.merge(b, n, (x, y) => x + y): Unit)
    buf
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any =
    if (buf.isEmpty) null
    else {
      val buckets = new Array[Long](buf.size)
      val it = buf.keySet().iterator()
      var i = 0
      while (it.hasNext) { buckets(i) = it.next(); i += 1 }
      java.util.Arrays.sort(buckets)
      var tot = 0L
      var j = 0
      while (j < buckets.length) { tot += buf.get(buckets(j)); j += 1 }
      // rank threshold: cum*10000 >= tot*pBp ⟺ cum >= ⌈tot·pBp/10000⌉
      // (cum is integral). Computed ONCE, overflow-safe: tot*pBp blows
      // past Long once a group's weight exceeds ~9.2e14 (the store-
      // serving path folds pre-summed counts, so tot grows with corpus
      // size at the 100 TB posture) — fall back to BigInteger there.
      val thr: Long =
        if (tot <= (Long.MaxValue - 9999L) / 10000L)
          (tot * pBp + 9999L) / 10000L
        else
          java.math.BigInteger.valueOf(tot)
            .multiply(java.math.BigInteger.valueOf(pBp.toLong))
            .add(java.math.BigInteger.valueOf(9999L))
            .divide(java.math.BigInteger.valueOf(10000L))
            .longValueExact()
      var cum = 0L
      var k = 0
      var res = buckets(buckets.length - 1)
      var found = false
      while (k < buckets.length && !found) {
        cum += buf.get(buckets(k))
        if (cum >= thr) { res = buckets(k); found = true }
        k += 1
      }
      res
    }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (b, n) => out.writeLong(b); out.writeLong(n) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[Long, Long](n * 2)
    var i = 0
    while (i < n) { m.put(in.readLong(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrPercentile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrPercentile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HdrPercentile =
    copy(value = newChildren(0), weight = newChildren(1))
}

object HdrPercentile {
  /** Basis points from a [0, 1] fraction, the one rounding step (done
    * once at construction, never per row). */
  def toBp(p: Double): Int = {
    require(p >= 0.0 && p <= 1.0, s"percentile out of range: $p")
    math.round(p * 10000).toInt
  }

  /** Column-API form: `hdrPercentile($"cents", 0.99)`. */
  def hdrPercentile(value: Column, p: Double, subBits: Int = 5): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HdrPercentile(
        org.apache.spark.sql.GraftColumnBridge.expression(value),
        Literal(1L), toBp(p), subBits).toAggregateExpression())

  /** SQL-registry builder: hdr_percentile(value, p[, subBits]). */
  def fromArgs(children: Seq[Expression]): Expression = {
    require(children.size == 2 || children.size == 3,
      "hdr_percentile(value, p[, subBits])")
    val p = children(1) match {
      case Literal(d: Double, DoubleType) => d
      case Literal(d: java.math.BigDecimal, _) => d.doubleValue()
      case Literal(dec, _: DecimalType) =>
        dec.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case Literal(i: Int, IntegerType) => i.toDouble
      case other => throw new IllegalArgumentException(
        s"hdr_percentile: p must be a literal fraction, got $other")
    }
    val sb = children.drop(2).headOption.map {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"hdr_percentile: subBits must be an int literal, got $other")
    }.getOrElse(5)
    HdrPercentile(children.head, Literal(1L), toBp(p), sb)
  }
}
