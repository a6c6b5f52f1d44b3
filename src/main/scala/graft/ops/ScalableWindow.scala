package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Globally-ordered window operators without the single-partition cliff.
  *
  * A bare `Window.orderBy(k)` moves the whole dataset to ONE task — fine at
  * 60k rows, fatal at 100 TB. These helpers implement the classic two-phase
  * distributed scan instead:
  *
  *   1. every row gets a DETERMINISTIC range-bucket id: the count of
  *      precomputed quantile boundaries ≤ its first order key. Boundaries
  *      come from one small driver-side sample job over a BOUNDED strided
  *      subset of the input (the same role as the sampling pass a
  *      `repartitionByRange` hides inside its exchange, but with IO
  *      independent of data size — a windowed query never pays a second
  *      full scan just to pick boundaries);
  *   2. the window runs *partitioned by* the bucket id — Catalyst inserts
  *      one hash shuffle on the bucket, N parallel WindowExecs;
  *   3. the carry of the scan (per-bucket sum / count / edge value) is a
  *      tiny aggregate — ONE ROW PER BUCKET, bounded by 4× the shuffle
  *      partition count, not the data — partial-aggregated map-side on the
  *      source (no second full-data shuffle), combined across buckets by a
  *      theta-join on the bucket id (b' < b ⇒ prefix, b' > b ⇒ suffix) and
  *      broadcast-joined back.
  *
  * Why an explicit bucket COLUMN and not `spark_partition_id()` after
  * `repartitionByRange` (rounds 1-3): a range exchange SAMPLES its
  * boundaries per physical instance, so the pid is only consistent between
  * the main and carry branches if ReuseExchange collapses their exchanges
  * into one. That held for parquet inputs but silently broke over the BAM
  * DSv2 source (plan trees differ → no reuse → each branch sampled its own
  * boundaries → every partition-boundary row got a wrong carry). A bucket
  * id computed from driver-collected literal boundaries is a pure function
  * of the row: every branch agrees BY CONSTRUCTION, no physical-plan
  * cooperation required, and results are exact however Catalyst/AQE plan
  * the query. Ties share a bucket (equal keys can't straddle a boundary);
  * the surplus of buckets over partitions (4×) smooths the hash placement.
  *
  * The cross-bucket carry is a join, NOT a partition-less window, and it
  * stays correct when buckets come out EMPTY (nearest non-empty bucket via
  * max_by/min_by theta-join, not adjacency). O(buckets²) comparisons ≈ 64M
  * at 2000 partitions — negligible, fully distributed. Results are
  * identical to the single-partition plan for unique order keys.
  */
object ScalableWindow {

  private[ops] val Pid = "__swb"

  /** Target size of the driver-collected boundary sample. Boundary QUALITY
    * only affects bucket balance, never results (see class doc), so a
    * bounded sample is all the precision the op needs. */
  private val SampleTarget = 100000
  /** Partitions probed by the sample job (strided subset when the input has
    * more — at 100 TB a scan can have 100k+ partitions and the sample must
    * not launch 100k tasks). */
  private val SampleMaxPartitions = 1024
  /** Within-partition stride: each probed task reads every `SampleStride`-th
    * row of its head, so the sample reaches ~stride × perPart rows deep
    * instead of only the first rows (heads of a sorted partition would
    * otherwise all but guarantee skewed boundaries). IO stays bounded:
    * ≤ stride × perPart rows per task, independent of data size. */
  private val SampleStride = 37

  /** Bounded, DETERMINISTIC sample of the order-key TUPLE (rows with a
    * null leading key are excluded — they always land in bucket 0): a
    * strided subset of partitions × a strided head of each. Unlike the
    * previous full-input `percentile_approx` (and unlike a Bernoulli
    * `df.sample`, which still reads every row), this job's IO is
    * O(partitions-probed × rows-per-probe) — constant per op however big
    * the input — so the boundary pass stops being a second full scan.
    * Each sampled tuple element is `null` or the column's extracted
    * value; tuples come back sorted by `ord`. */
  private def sampleKeys(df: DataFrame, keys: Seq[Column])
                        (implicit ord: Ordering[IndexedSeq[Any]])
      : Array[IndexedSeq[Any]] = {
    val rdd = df.select(keys: _*).rdd
    val nParts = rdd.getNumPartitions
    if (nParts == 0) return Array.empty
    val parts: Seq[Int] =
      if (nParts <= SampleMaxPartitions) 0 until nParts
      else (0 until SampleMaxPartitions)
        .map(i => ((i.toLong * nParts) / SampleMaxPartitions).toInt)
    val perPart = math.max(64, SampleTarget / parts.length)
    val width = keys.length
    val chunks = df.sparkSession.sparkContext.runJob(
      rdd,
      (it: Iterator[org.apache.spark.sql.Row]) => {
        val out = Array.newBuilder[IndexedSeq[Any]]
        var kept = 0
        var seen = 0
        // bound rows CONSUMED too, not just samples kept — a mostly-null
        // order key must not degrade the probe into a full partition scan
        val maxSeen = SampleStride * perPart
        while (it.hasNext && kept < perPart && seen < maxSeen) {
          val r = it.next()
          if (seen % SampleStride == 0 && !r.isNullAt(0)) {
            out += IndexedSeq.tabulate(width)(i =>
              if (r.isNullAt(i)) null else r.get(i))
            kept += 1
          }
          seen += 1
        }
        out.result()
      },
      parts)
    chunks.flatten.sorted
  }

  /** How many leading order columns participate in bucket boundaries.
    * One column is enough when it is (nearly) unique; a tie-heavy leading
    * key (a language code, a category) would collapse the shuffle to
    * ≤ #distinct buckets, so boundaries extend LEXICOGRAPHICALLY into the
    * second column. Capped at two: each extra column multiplies the
    * codegen'd when-chain's comparison count, and two levels already
    * restore balance for the tie-heavy-leading-key shape. */
  private val BucketCols = 2

  /** One order column's bucketing plan: the (possibly cast) column the
    * boundaries compare against, and a nulls-FIRST driver-side ordering
    * for the sampled values. */
  private final case class KeyCol(c: Column, ord: Ordering[Any])

  private def nullsFirst(cmp: (Any, Any) => Int): Ordering[Any] =
    new Ordering[Any] {
      override def compare(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else cmp(a, b)
    }

  private val doubleOrd: Ordering[Any] = nullsFirst((a, b) =>
    java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double]))

  /** Typed plan for one order column, or None for a type the boundary
    * grammar can't compare (legal for NON-leading columns: they simply
    * stop the lexicographic extension; the leading column fails loudly
    * in [[bucketed]]).
    *
    * The bucket key only needs WEAK monotonicity in the column's own sort
    * order (ties collapse into one bucket; the in-bucket window sort
    * settles exact order), but it must never INVERT it. That rules out
    * casting TIMESTAMP_NTZ through the session zone: wall-clock →
    * instant is non-monotone across a DST spring-forward gap (02:30
    * resolves PAST 03:00's instant), which would mis-bucket rows near a
    * boundary in the skipped hour. NTZ and DATE keys therefore derive
    * from timezone-free wall-clock field arithmetic; only the
    * instant-based TIMESTAMP casts numerically. */
  private def keyColFor(df: DataFrame, name: String): Option[KeyCol] = {
    import org.apache.spark.sql.types._
    val epoch = to_date(lit("1970-01-01"))
    df.select(col(name)).schema.head.dataType match {
      case _: NumericType =>
        Some(KeyCol(col(name).cast("double"), doubleOrd))
      case TimestampType =>
        Some(KeyCol(col(name).cast("double"), doubleOrd))
      case TimestampNTZType =>
        val c = col(name)
        val wallSeconds =
          datediff(c.cast("date"), epoch).cast("double") * 86400d +
            hour(c) * 3600d + minute(c) * 60d + second(c)
        Some(KeyCol(wallSeconds, doubleOrd))
      case DateType =>
        Some(KeyCol(datediff(col(name), epoch).cast("double"), doubleOrd))
      case StringType =>
        Some(KeyCol(col(name), nullsFirst((a, b) =>
          a.asInstanceOf[String].compareTo(b.asInstanceOf[String]))))
      case _ => None
    }
  }

  /** Quantile boundary tuples from the sorted sample, then the bucket
    * id via [[graft.expressions.RangeBucket]] — a binary search over
    * the boundary table, which rides along as ONE reference object: the
    * index of the first boundary ABOVE the key tuple (null leading keys
    * sort first → bucket 0). Correctness does not depend on boundary
    * QUALITY — `min{i : k < b_i}` is monotone in `k` for any boundary
    * list — only balance does, so an approximate sample is all the
    * precision the op needs.
    *
    * An Expression, not a `when`-chain of literal comparisons: the
    * Column encoding was a ~1500-node tree that Catalyst cloned into
    * every plan branch the bucket column reaches (both arms of the
    * two-phase window × each arm of a union input) — megabyte task
    * binaries, one Janino compile per clone, and that compile cost
    * dominated the operator (measured 42 cpu-s on a 50k-row 10-way
    * union, 3× recovered by this change). See RangeBucket's doc. */
  private def bucketFromSample(keys: IndexedSeq[Column],
                               sample: Array[IndexedSeq[Any]],
                               buckets: Int): Column = {
    val bs: IndexedSeq[IndexedSeq[Any]] =
      if (sample.isEmpty) IndexedSeq.empty
      else (1 until buckets)
        .map(i => sample(math.min( // Long math: buckets×sampleLen can pass Int.Max
          ((i.toLong * sample.length) / buckets).toInt, sample.length - 1)))
        .distinct // equal quantiles → one boundary (list stays ascending)
    if (bs.isEmpty) lit(0)
    else {
      val bnd: Array[Array[AnyRef]] = bs.map(_.map[AnyRef] {
        case null => null
        case s: String => // sampled via Row.get; compared as UTF8String
          org.apache.spark.unsafe.types.UTF8String.fromString(s)
        case d: java.lang.Double => d
        case other => throw new IllegalStateException(
          s"ScalableWindow: unexpected boundary element class ${other.getClass}")
      }.toArray).toArray
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.expressions.RangeBucket(
          keys.map(org.apache.spark.sql.GraftColumnBridge.expression),
          bnd))
    }
  }

  /** Stamp the deterministic range-bucket id from a LEXICOGRAPHIC PREFIX
    * of the order columns (up to [[BucketCols]] — a sort-order-consistent
    * prefix; later order columns only break ties within a bucket's
    * window sort). Supported key types: any numeric (incl. decimal),
    * timestamp, date (bucketed through their epoch seconds), and string
    * (bucketed by Spark's binary string order — the driver-side sample
    * sort differs from UTF-8 byte order only for supplementary
    * characters, which costs balance, not correctness). An unsupported
    * LEADING type fails LOUDLY — a silent null-cast here would collapse
    * every row into one bucket and re-create the single-partition cliff
    * these operators exist to avoid; an unsupported second column just
    * stops the lexicographic extension (sound, first-column balance). */
  private[ops] def bucketed(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val buckets = 4 * n
    val head = keyColFor(df, orderCols.head).getOrElse {
      val dt = df.select(col(orderCols.head)).schema.head.dataType
      throw new IllegalArgumentException(
        s"ScalableWindow: unsupported leading order-key type $dt for " +
          s"'${orderCols.head}' — supported: numeric, string, " +
          "timestamp, date. Order by a supported prefix column (later " +
          "columns may be any type) or derive a sortable key first.")
    }
    // extend boundaries into following columns while their types allow
    val kcs: IndexedSeq[KeyCol] = head +:
      orderCols.drop(1).take(BucketCols - 1).iterator
        .map(keyColFor(df, _)).takeWhile(_.isDefined).map(_.get).toIndexedSeq
    implicit val tupleOrd: Ordering[IndexedSeq[Any]] =
      new Ordering[IndexedSeq[Any]] {
        override def compare(a: IndexedSeq[Any], b: IndexedSeq[Any]): Int = {
          var i = 0
          while (i < a.length) {
            val c = kcs(i).ord.compare(a(i), b(i))
            if (c != 0) return c
            i += 1
          }
          0
        }
      }
    val keys = kcs.map(_.c)
    val bucket = bucketFromSample(keys, sampleKeys(df, keys), buckets)
    df.withColumn(Pid, bucket)
  }

  private def pidWindow(orderCols: Seq[String]) =
    Window.partitionBy(Pid).orderBy(orderCols.map(col): _*)

  /** Running sum of `value` over the global `orderCols` order, exclusive of
    * the current row (the prefix-sum / scanLeft shape, SURVEY.md A15/W3). */
  def prefixSumExclusive(df: DataFrame, orderCols: Seq[String],
                         value: Column, out: String): DataFrame = {
    val r = bucketed(df, orderCols)
    val agg = r.groupBy(Pid).agg(sum(value).as("__s"))
    val b = agg.select(col(Pid).as("__bp"), col("__s").as("__bs"))
    val carry = agg.join(b, col("__bp") < col(Pid), "left")
      .groupBy(Pid).agg(coalesce(sum("__bs"), lit(0)).as("__carry"))
    val within = sum(value).over(
      pidWindow(orderCols).rowsBetween(Window.unboundedPreceding, -1))
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out, coalesce(within, lit(0)) + coalesce(col("__carry"), lit(0)))
      .drop(Pid, "__carry")
  }

  /** Global row_number() without a single-partition sort. */
  def rowNumber(df: DataFrame, orderCols: Seq[String], out: String): DataFrame = {
    val r = bucketed(df, orderCols)
    val agg = r.groupBy(Pid).agg(count(lit(1)).as("__c"))
    val b = agg.select(col(Pid).as("__bp"), col("__c").as("__bc"))
    val carry = agg.join(b, col("__bp") < col(Pid), "left")
      .groupBy(Pid).agg(coalesce(sum("__bc"), lit(0L)).as("__off"))
    r.join(broadcast(carry), Seq(Pid), "left")
      // LONG arithmetic end-to-end: the carry offset is a running COUNT of
      // all preceding buckets' rows, which passes 2^31 long before the
      // claimed scale does — an int cast here would wrap silently
      .withColumn(out,
        row_number().over(pidWindow(orderCols)).cast("long") +
          coalesce(col("__off"), lit(0L)))
      .drop(Pid, "__off")
  }

  /** Global rank() (ties share a rank, gaps after) without a
    * single-partition sort. Sound on the same argument as [[rowNumber]]:
    * the bucket id is a function of a lexicographic PREFIX of the order
    * key, so rows with equal full key tuples always co-bucket — the
    * within-bucket rank() sees every peer of a row, and the carry (total
    * rows in preceding buckets) counts exactly the rows strictly below
    * the bucket's whole key range. */
  def rank(df: DataFrame, orderCols: Seq[String], out: String): DataFrame = {
    val r = bucketed(df, orderCols)
    val agg = r.groupBy(Pid).agg(count(lit(1)).as("__c"))
    val b = agg.select(col(Pid).as("__bp"), col("__c").as("__bc"))
    val carry = agg.join(b, col("__bp") < col(Pid), "left")
      .groupBy(Pid).agg(coalesce(sum("__bc"), lit(0L)).as("__off"))
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out,
        org.apache.spark.sql.functions.rank().over(pidWindow(orderCols))
          .cast("long") + coalesce(col("__off"), lit(0L)))
      .drop(Pid, "__off")
  }

  /** Global dense_rank(): ties share a rank, NO gaps. The carry is the
    * count of DISTINCT key tuples in preceding buckets — well-defined
    * because a key tuple never spans buckets (same prefix → same bucket),
    * so per-bucket distinct counts add. */
  def denseRank(df: DataFrame, orderCols: Seq[String],
                out: String): DataFrame = {
    val r = bucketed(df, orderCols)
    val key = struct(orderCols.map(col): _*)
    val agg = r.groupBy(Pid).agg(countDistinct(key).as("__d"))
    val b = agg.select(col(Pid).as("__bp"), col("__d").as("__bd"))
    val carry = agg.join(b, col("__bp") < col(Pid), "left")
      .groupBy(Pid).agg(coalesce(sum("__bd"), lit(0L)).as("__off"))
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out,
        dense_rank().over(pidWindow(orderCols)).cast("long") +
          coalesce(col("__off"), lit(0L)))
      .drop(Pid, "__off")
  }

  /** Global percent_rank() = (rank − 1)/(N − 1), 0.0 for a single row —
    * derived from [[rank]] plus one broadcast total, so the plan is the
    * two-phase rank with one more tiny join. The division is a single
    * IEEE double op on exact integer operands: bit-stable across engines
    * and partitionings, no rounding needed. */
  def percentRank(df: DataFrame, orderCols: Seq[String],
                  out: String): DataFrame = {
    val r = rank(df, orderCols, out)
    val n = df.groupBy().agg(count(lit(1)).as("__n"))
    r.crossJoin(broadcast(n))
      .withColumn(out,
        when(col("__n") > 1,
          (col(out) - 1).cast("double") / (col("__n") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .drop("__n")
  }

  /** Global cume_dist() = (# rows with key ≤ current)/N, peers included —
    * the within-bucket count uses the ordered window's DEFAULT frame
    * (RANGE UNBOUNDED PRECEDING..CURRENT ROW, which spans all peers of
    * the current key), plus the preceding-buckets row carry. */
  def cumeDist(df: DataFrame, orderCols: Seq[String],
               out: String): DataFrame = {
    val r = bucketed(df, orderCols)
    val agg = r.groupBy(Pid).agg(count(lit(1)).as("__c"))
    val b = agg.select(col(Pid).as("__bp"), col("__c").as("__bc"))
    val carry = agg.join(b, col("__bp") < col(Pid), "left")
      .groupBy(Pid).agg(coalesce(sum("__bc"), lit(0L)).as("__off"))
    val n = df.groupBy().agg(count(lit(1)).as("__n"))
    val le = count(lit(1)).over(pidWindow(orderCols)) // default RANGE frame
    r.join(broadcast(carry), Seq(Pid), "left")
      .crossJoin(broadcast(n))
      .withColumn(out,
        (le + coalesce(col("__off"), lit(0L))).cast("double") /
          col("__n").cast("double"))
      .drop(Pid, "__off", "__n")
  }

  /** All four rank forms in ONE two-phase pass: one bucket stamp, one
    * per-bucket aggregate carrying (row count, distinct-key count), and
    * one WindowExec serving rank/dense_rank/peer-count (identical
    * window spec → Spark fuses them) — versus 4 samples and 8 shuffles
    * for the chained single-op calls (measured ~2.5× the wall on the
    * gate shape). Semantics identical to [[rank]]/[[denseRank]]/
    * [[percentRank]]/[[cumeDist]] (spec-pinned equal). */
  def rankFamily(df: DataFrame, orderCols: Seq[String],
                 rnk: String, drnk: String, prnk: String,
                 cdist: String): DataFrame = {
    val r = bucketed(df, orderCols)
    val key = struct(orderCols.map(col): _*)
    val agg = r.groupBy(Pid)
      .agg(count(lit(1)).as("__c"), countDistinct(key).as("__d"))
    val b = agg.select(col(Pid).as("__bp"), col("__c").as("__bc"),
      col("__d").as("__bd"))
    val carry = agg.join(b, col("__bp") < col(Pid), "left")
      .groupBy(Pid).agg(coalesce(sum("__bc"), lit(0L)).as("__offr"),
        coalesce(sum("__bd"), lit(0L)).as("__offd"))
    val n = df.groupBy().agg(count(lit(1)).as("__n"))
    val w = pidWindow(orderCols)
    r.join(broadcast(carry), Seq(Pid), "left")
      .crossJoin(broadcast(n))
      .withColumn(rnk,
        org.apache.spark.sql.functions.rank().over(w).cast("long") +
          coalesce(col("__offr"), lit(0L)))
      .withColumn(drnk, dense_rank().over(w).cast("long") +
        coalesce(col("__offd"), lit(0L)))
      .withColumn(prnk,
        when(col("__n") > 1,
          (col(rnk) - 1).cast("double") / (col("__n") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn(cdist,
        (count(lit(1)).over(w) + coalesce(col("__offr"), lit(0L)))
          .cast("double") / col("__n").cast("double"))
      .drop(Pid, "__offr", "__offd", "__n")
  }

  /** Global ntile(t) — SQL's remainder rule (the first `N mod t` tiles
    * take one extra row), derived arithmetically from the two-phase
    * [[rowNumber]] plus one broadcast total: tile boundaries are a pure
    * function of (rn, N, t), so no second window pass is needed. */
  def ntile(df: DataFrame, orderCols: Seq[String], t: Int,
            out: String): DataFrame = {
    require(t >= 1, s"ntile needs t >= 1, got $t")
    val rn = rowNumber(df, orderCols, "__rn")
    val n = df.groupBy().agg(count(lit(1)).as("__N"))
    rn.crossJoin(broadcast(n))
      .withColumn("__q", floor(col("__N") / t).cast("long"))
      .withColumn("__r", col("__N") % t)
      // floor-of-double division is exact below 2^53 rows — comfortably
      // past any real N; the small tiles are counted back from the END
      // (each exactly __q rows), which never divides by the zero __q of
      // the N < t case (that case always takes the first branch: every
      // rn ≤ __r = N)
      .withColumn(out,
        when(col("__rn") <= col("__r") * (col("__q") + 1),
          floor((col("__rn") - 1) / (col("__q") + 1)) + 1)
          .otherwise(lit(t.toLong) -
            floor((col("__N") - col("__rn")) / greatest(col("__q"), lit(1L))))
          .cast("long"))
      .drop("__rn", "__N", "__q", "__r")
  }

  /** lag(value, 1) over the global order. Bucket-first rows take the
    * last value of the nearest NON-EMPTY preceding bucket (max_by over
    * the bucket theta-join); the carry applies ONLY to the first row of
    * each bucket (gated on row_number, not on lag() being null, so a
    * legitimately-null predecessor value stays null). */
  def lag1(df: DataFrame, orderCols: Seq[String], value: String,
           out: String): DataFrame = {
    val r = bucketed(df, orderCols)
    val ord = struct(orderCols.map(col): _*)
    val last = r.groupBy(Pid).agg(max_by(col(value), ord).as("__last"))
    val b = last.select(col(Pid).as("__bp"), col("__last").as("__bl"))
    val carry = last.join(b, col("__bp") < col(Pid), "left")
      .groupBy(Pid).agg(max_by(col("__bl"), col("__bp")).as("__carry"))
    val w = pidWindow(orderCols)
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out,
        when(row_number().over(w) === 1, col("__carry"))
          .otherwise(lag(value, 1).over(w)))
      .drop(Pid, "__carry")
  }

  /** First non-null `value` at-or-after the current row in the global
    * `orderCols` order (backward fill — the "next record start" shape of
    * check-blocks). `value` may be any type incl. struct; rows past the
    * last non-null get null. */
  def fillBackward(df: DataFrame, orderCols: Seq[String],
                   value: Column, out: String): DataFrame = {
    val r = bucketed(df, orderCols).withColumn("__v", value)
    val ord = struct(orderCols.map(col): _*)
    // first non-null per bucket, by order: min over (order, value)
    // structs of the non-null rows (nulls drop out of min)
    val fnn = r.groupBy(Pid)
      .agg(min(when(col("__v").isNotNull,
        struct(ord.as("__o"), col("__v").as("__x")))).as("__fnn"))
    val b = fnn.select(col(Pid).as("__bp"), col("__fnn").as("__bf"))
    // nearest following bucket that HAS a non-null value
    val carry = fnn.join(b, col("__bp") > col(Pid) && col("__bf").isNotNull, "left")
      .groupBy(Pid).agg(min_by(col("__bf.__x"), col("__bp")).as("__carry"))
    val within = first(col("__v"), ignoreNulls = true).over(
      pidWindow(orderCols).rowsBetween(0, Window.unboundedFollowing))
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out, coalesce(within, col("__carry")))
      .drop(Pid, "__v", "__carry")
  }

  /** lead(value, 1) with `default` past the global end. Bucket-last rows
    * take the first value of the nearest non-empty following bucket; the
    * struct-wrapped carry distinguishes "no following bucket" (→
    * default) from "next value is null" (→ null), matching
    * single-partition lead semantics. */
  def lead1(df: DataFrame, orderCols: Seq[String], value: String,
            out: String, default: Column): DataFrame = {
    val r = bucketed(df, orderCols)
    val ord = struct(orderCols.map(col): _*)
    val firstA = r.groupBy(Pid).agg(min_by(col(value), ord).as("__first"))
    val b = firstA.select(col(Pid).as("__bp"),
      struct(col("__first").as("__v")).as("__bf"))
    val carry = firstA.join(b, col("__bp") > col(Pid), "left")
      .groupBy(Pid).agg(min_by(col("__bf"), col("__bp")).as("__carry"))
    val w = pidWindow(orderCols)
    val isLast = row_number().over(w) === count(lit(1)).over(Window.partitionBy(Pid))
    r.join(broadcast(carry), Seq(Pid), "left")
      .withColumn(out,
        when(isLast,
          when(col("__carry").isNull, default).otherwise(col("__carry.__v")))
          .otherwise(lead(value, 1).over(w)))
      .drop(Pid, "__carry")
  }
}
