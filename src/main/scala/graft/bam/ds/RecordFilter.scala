package graft.bam.ds

import org.apache.spark.sql.sources._

import graft.bam.codec.Bam

/** Compiles pushed predicates into a [[Bam.PrefixPred]] the partition
  * reader evaluates on the fixed 32-byte record prefix BEFORE
  * materializing name / cigar / seq / qual / attrs — column pruning's
  * sibling for rows (P-pushdown to the byte level). Two sources:
  *
  *  - The scan's pushed V1 `Filter`s, restricted to the prefix fields
  *    (`flags`, `refIdx`, `pos`, `mapq`, `nextRefIdx`, `nextPos`,
  *    `templateLen`). Anything else compiles to `true` — evaluation is
  *    CONSERVATIVE; Spark's residual filter keeps results exact.
  *  - A `flagbits` spec (`all:M` / `none:M` / `any:M`, `;`-separated)
  *    carried through scan options by
  *    [[graft.plans.BamBitFilterPushdown]], because bitwise tests like
  *    `flags & 4 = 4` have no V1 `Filter` form.
  *
  * The reference decodes every record and filters above the loader
  * (e.g. its unmapped-read scans); here an unmapped-only scan touches
  * 32 bytes of a mapped record instead of the whole thing.
  */
object RecordFilter {

  /** Prefix-field accessor index, matching [[Bam.PrefixPred]]'s args. */
  private val Fields: Map[String, Int] = Map(
    "refIdx" -> 0, "pos" -> 1, "mapq" -> 2, "flags" -> 3,
    "nextRefIdx" -> 4, "nextPos" -> 5, "templateLen" -> 6)

  /** One compiled conjunct over the prefix-field array. */
  private type P = Array[Int] => Boolean
  private val True: P = _ => true

  private def asInt(v: Any): Option[Int] = v match {
    case i: Int => Some(i)
    case l: Long if l >= Int.MinValue && l <= Int.MaxValue => Some(l.toInt)
    case s: Short => Some(s.toInt)
    case b: Byte => Some(b.toInt)
    case _ => None
  }

  /** TOP-LEVEL compile: pushed filters are implicitly conjoined, so a
    * conjunction may keep whichever conjuncts compile and drop the rest —
    * the result is conservative (a superset of matching records) and
    * Spark's residual filter keeps the answer exact. This laxity is ONLY
    * sound at the top level / under And: inside `Not` a conservative
    * child would flip to unsound (records the query wants would be
    * skipped before decode, and no residual filter can resurrect a
    * skipped record), so nested compilation goes through [[compileExact]],
    * where And demands BOTH children exact like Not/Or do. */
  private def compileTop(f: Filter): Option[P] = f match {
    case And(l, r) =>
      (compileTop(l), compileTop(r)) match {
        case (Some(a), Some(b)) => Some((v: Array[Int]) => a(v) && b(v))
        case (a, b) => a.orElse(b) // drop the uncompilable conjunct
      }
    case other => compileExact(other)
  }

  private def compileExact(f: Filter): Option[P] = f match {
    case And(l, r) =>
      for (a <- compileExact(l); b <- compileExact(r))
        yield (v: Array[Int]) => a(v) && b(v)
    case Or(l, r) =>
      for (a <- compileExact(l); b <- compileExact(r))
        yield (v: Array[Int]) => a(v) || b(v)
    case Not(c) => compileExact(c).map(p => (v: Array[Int]) => !p(v))
    case EqualTo(att, value) =>
      for (i <- Fields.get(att); x <- asInt(value)) yield (v: Array[Int]) => v(i) == x
    case GreaterThan(att, value) =>
      for (i <- Fields.get(att); x <- asInt(value)) yield (v: Array[Int]) => v(i) > x
    case GreaterThanOrEqual(att, value) =>
      for (i <- Fields.get(att); x <- asInt(value)) yield (v: Array[Int]) => v(i) >= x
    case LessThan(att, value) =>
      for (i <- Fields.get(att); x <- asInt(value)) yield (v: Array[Int]) => v(i) < x
    case LessThanOrEqual(att, value) =>
      for (i <- Fields.get(att); x <- asInt(value)) yield (v: Array[Int]) => v(i) <= x
    case In(att, values) =>
      Fields.get(att).flatMap { i =>
        val xs = values.flatMap(asInt)
        if (xs.length == values.length) {
          val set = xs.toSet
          Some((v: Array[Int]) => set(v(i)))
        } else None
      }
    case IsNull(att) if Fields.contains(att) =>
      Some(_ => false) // prefix fields are non-nullable
    case IsNotNull(att) if Fields.contains(att) => Some(True)
    case _ => None
  }

  /** Parse a `flagbits` option: `all:M` = all bits of M set, `none:M` =
    * no bit of M set, `any:M` = at least one bit of M set; conjuncts
    * separated by `;`. Unknown syntax is rejected loudly — this string
    * is only ever authored by the optimizer rule. */
  def parseFlagBits(spec: String): Seq[(String, Int)] =
    spec.split(";").toIndexedSeq.filter(_.nonEmpty).map { part =>
      part.split(":") match {
        case Array(op, m) if Set("all", "none", "any")(op) => (op, m.toInt)
        case _ => throw new IllegalArgumentException(s"bad flagbits: $part")
      }
    }

  /** The combined prefix predicate, or None when nothing compiles (the
    * reader then stays on the unconditional decode path — no per-record
    * predicate indirection on unfiltered scans). */
  def build(filters: Seq[Filter], flagBits: String): Option[Bam.PrefixPred] = {
    val fromFilters = filters.map(compileTop).flatten
    val fromBits: Seq[P] = parseFlagBits(flagBits).map {
      case ("all", m) => (v: Array[Int]) => (v(3) & m) == m
      case ("none", m) => (v: Array[Int]) => (v(3) & m) == 0
      case (_, m) => (v: Array[Int]) => (v(3) & m) != 0 // any
    }
    val all = (fromFilters ++ fromBits).toArray
    if (all.isEmpty) None
    else Some(new Bam.PrefixPred {
      // reusable field buffer: build() is called once per PARTITION READER
      // (single-threaded), so the instance is never shared across tasks
      private val v = new Array[Int](7)
      override def apply(refIdx: Int, pos: Int, mapq: Int, flags: Int,
                         nextRefIdx: Int, nextPos: Int,
                         templateLen: Int): Boolean = {
        v(0) = refIdx; v(1) = pos; v(2) = mapq; v(3) = flags
        v(4) = nextRefIdx; v(5) = nextPos; v(6) = templateLen
        var i = 0
        while (i < all.length) {
          if (!all(i)(v)) return false
          i += 1
        }
        true
      }
    })
  }
}
