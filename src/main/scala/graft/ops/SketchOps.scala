package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed frequency sketches.
  *
  * Exact heavy-hitter queries (`GROUP BY key ORDER BY n DESC LIMIT k`)
  * shuffle one row per DISTINCT key — at 100 TB with a high-cardinality
  * key (URLs, user ids, n-grams) the aggregation state itself is the
  * bottleneck. A Misra-Gries summary caps the state at `k` counters per
  * partition and ships only those through the partial-agg tree, trading
  * exactness for a PROVABLE bound: after any sequence of merges
  * (Agarwal et al., "Mergeable Summaries", PODS'12 — MG summaries merge
  * by counter-sum + decrement-by-(k+1)th-largest), every key with true
  * frequency > n/(k+1) is present, and its reported count undershoots the
  * true count by at most n/(k+1). The bound — not the raw counter values,
  * which depend on merge order — is what downstream code may rely on, and
  * it is what the gate's self-check oracle asserts.
  */
object SketchOps {

  /** Misra-Gries top-k summary as a typed [[Aggregator]]: buffer and
    * result are a plain `counter -> weight` map of size ≤ k, natively
    * encodable (no kryo), mergeable in any order. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, "MisraGries needs k >= 1")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
      b.get(key) match {
        case Some(c) => b.updated(key, c + 1)
        case None if b.size < k => b.updated(key, 1L)
        case None =>
          // classic MG step: a full summary + an unseen key decrements
          // every counter (the unseen key's single occurrence cancels too)
          b.flatMap { case (ky, c) => if (c > 1) Some(ky -> (c - 1)) else None }
      }

    /** Counter-sum, then shrink back to k by subtracting the (k+1)-th
      * largest combined count — the mergeable-summaries rule that keeps
      * the total error additive (≤ n/(k+1) after any merge tree). */
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val combined = y.foldLeft(x) { case (m, (ky, c)) =>
        m.updated(ky, m.getOrElse(ky, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
        combined.flatMap { case (ky, c) =>
          if (c > cut) Some(ky -> (c - cut)) else None
        }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** The MG summary of `key` as a single aggregate Column (map type). */
  def misraGries(key: Column, k: Int): Column =
    udaf(new MisraGries(k)).apply(key)

  /** Count-Min sketch: `d` hash rows × `w` counters; a key's estimate is
    * the minimum of its `d` counters. Guarantees: est ≥ true always
    * (counters only ever add), and est ≤ true + (e/w)·n with probability
    * 1 − e^−d per key. Unlike Misra-Gries the buffer merge is a plain
    * element-wise sum, so the merged sketch is EXACTLY the sketch of the
    * whole input — estimates are partitioning-invariant, which is what
    * lets the claim columns below sit in a hash-compared gate.
    *
    * The aggregator consumes PRE-HASHED bucket positions (an `array<int>`
    * of length `d`, from [[cmsPositions]]) rather than raw keys: the
    * hash is thereby defined once, in SQL (`xxhash64(i, key) pmod w`),
    * and the estimate side recomputes it with the very same expression —
    * no Scala reimplementation of Spark's hash to drift out of sync. */
  final class CountMin(d: Int, w: Int)
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    require(d >= 1 && w >= 2, "CountMin needs d >= 1, w >= 2")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(b: Array[Long], pos: Seq[Int]): Array[Long] = {
      var i = 0
      while (i < d) { b(i * w + pos(i)) += 1L; i += 1 }
      b
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** The `d` bucket positions of `key`: `pmod(xxhash64(i, key), w)` for
    * each hash row i — the shared definition both the sketch build and
    * the estimate lookup use. */
  def cmsPositions(key: Column, d: Int, w: Int): Column =
    transform(sequence(lit(0), lit(d - 1)),
      i => pmod(xxhash64(i, key), lit(w)).cast("int"))

  /** The CMS of `key` as one aggregate Column (array of d·w counters). */
  def countMin(key: Column, d: Int, w: Int): Column =
    udaf(new CountMin(d, w),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())
      .apply(cmsPositions(key, d, w))

  /** Self-checking CMS frame: every distinct key with its exact count
    * (the oracle-comparable part) plus the two sketch claims —
    * `ge_exact` (deterministic: counters never undercount) and
    * `within_eps` (est ≤ exact + ⌈(e/w)·n⌉, the paper bound; per-key
    * deterministic for a fixed dataset because the merged sketch is
    * partitioning-invariant). The raw counter array never leaves. */
  def cmsChecked(df: DataFrame, keyCol: Column, d: Int, w: Int): DataFrame = {
    val keyed = df.select(keyCol.cast("string").as("key"))
    val sketch = keyed.agg(countMin(col("key"), d, w).as("__cms"))
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("exact_n"))
    val total = exact.agg(sum("exact_n").as("__n"))
    val est = array_min(transform(sequence(lit(0), lit(d - 1)),
      i => element_at(col("__cms"),
        (i * w + pmod(xxhash64(i, col("key")), lit(w))).cast("int") + 1)))
    val eps = ceil(col("__n") * lit(math.E) / lit(w))
    exact
      .join(broadcast(total))
      .join(broadcast(sketch))
      .withColumn("__est", est)
      .select(
        col("key"), col("exact_n"),
        (col("__est") >= col("exact_n")).as("ge_exact"),
        (col("__est") <= col("exact_n") + eps).as("within_eps"))
  }

  /** Per-GROUP heavy hitters: one Misra-Gries summary per group key —
    * the sketch rides the normal partial-agg tree per group, so state
    * is `k` counters × |groups|, never |distinct keys|. Same
    * self-check contract as [[heavyHittersChecked]], with the bound
    * applied within each group (n = the group's row count). */
  def heavyHittersPerGroupChecked(df: DataFrame, groupCol: Column,
                                  keyCol: Column, k: Int): DataFrame = {
    val keyed = df.select(groupCol.cast("string").as("grp"),
      keyCol.cast("string").as("key"))
    val sketches = keyed.groupBy("grp")
      .agg(misraGries(col("key"), k).as("__sketch"))
    val exact = keyed.groupBy("grp", "key").agg(count(lit(1)).as("exact_n"))
    val totals = keyed.groupBy("grp").agg(count(lit(1)).as("__n"))
    exact
      .join(broadcast(totals), "grp")
      .join(broadcast(sketches), "grp")
      .filter(col("exact_n") * (k + 1) > col("__n"))
      .select(
        col("grp"), col("key"), col("exact_n"),
        (element_at(col("__sketch"), col("key")).isNotNull &&
          (col("exact_n") - coalesce(element_at(col("__sketch"), col("key")), lit(0L)))
            * (k + 1) <= col("__n")).as("within_bound"))
  }

  /** Join-size estimation by CMS inner product — the query-optimizer
    * classic: |A ⋈ B on k| = Σ_k f_A(k)·f_B(k), and the sketches'
    * row-wise inner product min'd over rows estimates it from two
    * fixed-size summaries, never touching the join. The estimate NEVER
    * undercounts (colliding keys only add mass to a bucket product),
    * so `ge_exact` is deterministic; `within_eps` is the
    * (e/w)·n_A·n_B bound. Both sketches hash with the same SQL-defined
    * [[cmsPositions]], which is what makes the products line up. */
  def cmsJoinSizeChecked(left: DataFrame, leftKey: Column,
                         right: DataFrame, rightKey: Column,
                         d: Int, w: Int): DataFrame = {
    val l = left.select(leftKey.cast("string").as("key"))
    val r = right.select(rightKey.cast("string").as("key"))
    val s1 = l.agg(countMin(col("key"), d, w).as("__c1"),
      count(lit(1)).as("__n1"))
    val s2 = r.agg(countMin(col("key"), d, w).as("__c2"),
      count(lit(1)).as("__n2"))
    val exact = l.join(r, "key").agg(count(lit(1)).as("exact_n"))
    val est = array_min(transform(sequence(lit(0), lit(d - 1)), i =>
      aggregate(sequence(lit(0), lit(w - 1)), lit(0L), (acc, j) =>
        acc +
          element_at(col("__c1"), (i * w + j + 1).cast("int")) *
          element_at(col("__c2"), (i * w + j + 1).cast("int")))))
    exact.join(broadcast(s1)).join(broadcast(s2))
      .withColumn("__est", est)
      .select(col("exact_n"),
        (col("__est") >= col("exact_n")).as("ge_exact"),
        (col("__est") <= col("exact_n") +
          ceil(col("__n1") * col("__n2") * lit(math.E) / lit(w)))
          .as("within_eps"))
  }

  /** Self-checking heavy-hitters frame: for every key whose TRUE
    * frequency exceeds n/(k+1) (computed exactly), report the exact count
    * plus `within_bound` — whether the MG sketch found the key with
    * undercount ≤ n/(k+1), the paper guarantee. The exact side is the
    * oracle-comparable part; the sketch's raw counters never leave this
    * function (they are merge-order-dependent, the bound is not).
    */
  def heavyHittersChecked(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    val keyed = df.select(keyCol.cast("string").as("key"))
    val sketch = keyed.agg(misraGries(col("key"), k).as("__sketch"))
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("exact_n"))
    val total = exact.agg(sum("exact_n").as("__n"))
    exact
      .join(broadcast(total))
      .join(broadcast(sketch))
      .filter(col("exact_n") * (k + 1) > col("__n"))
      .select(
        col("key"), col("exact_n"),
        (element_at(col("__sketch"), col("key")).isNotNull &&
          (col("exact_n") - coalesce(element_at(col("__sketch"), col("key")), lit(0L)))
            * (k + 1) <= col("__n")).as("within_bound"))
  }

  // ------------------------------------------------- persisted HLL store

  /** Write (or append to) a PERSISTED mergeable-sketch rollup: one
    * DataSketches HLL sketch (binary column, Spark's `hll_sketch_agg`)
    * per `groupCols` cell over the distinct values of `keyCol`.
    *
    * This is the sketch-rollup-table pattern for 100 TB distinct-count
    * workloads: the raw corpus is scanned ONCE per ingest batch (a day, an
    * hour), each batch appends its cells' fixed-size register blobs
    * (2^lgK bytes-ish, independent of cardinality), and any later
    * distinct-count query over any subset of batches merges blobs instead
    * of re-shuffling raw keys — HLL register merge is max-commutative, so
    * the union is order- and partitioning-independent. */
  def writeHllStore(df: DataFrame, path: String, groupCols: Seq[String],
                    keyCol: Column, lgK: Int = 12,
                    append: Boolean = false): Unit =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(keyCol, lit(lgK)).as("hll"))
      .write.mode(if (append) "append" else "overwrite").parquet(path)

  /** Distinct-count estimates from a [[writeHllStore]] table: union the
    * persisted sketches down to `rollupCols` (a PREFIX or subset of the
    * store's group columns) and estimate. Touches only the store — cost is
    * proportional to the number of cells, never the raw corpus. */
  def readHllStore(spark: org.apache.spark.sql.SparkSession, path: String,
                   rollupCols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(rollupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"), lit(true)))
        .as("approx_distinct"))

  /** Compact an append-accreted [[writeHllStore]] table down to ONE blob
    * per cell: union within each group-column cell and atomically swap the
    * result in. Append ingest leaves one blob per (cell, batch); estimates
    * stay exact regardless (union is what reads do anyway), but store size
    * and read fan-in grow with batch count — the same accretion every
    * append store pays, reclaimed the same way. Union-then-rewrite loses
    * nothing: the compacted registers are byte-for-byte what any later
    * union would have produced from the parts. `groupCols` must be the
    * store's full grouping (compacting to a coarser rollup would destroy
    * the finer cells). */
  def compactHllStore(spark: org.apache.spark.sql.SparkSession, path: String,
                      groupCols: Seq[String]): Unit = {
    val compacted = spark.read.parquet(path)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("hll"), lit(true)).as("hll"))
      .localCheckpoint(true) // freeze before overwriting what it reads
    compacted.write.mode("overwrite").parquet(path)
    spark.catalog.refreshByPath(path)
  }

  // -------------------------------------------------------- HDR quantiles

  /** HdrHistogram-style log2 sub-bucket lower bound for a long value
    * (Gray & Tene's HdrHistogram bucketing, public domain): positive
    * values keep their top `subBits + 1` significant bits and zero the
    * rest, so bucket width ≤ value · 2⁻ˢᵘᵇᴮⁱᵗˢ and any quantile read off
    * the bucket table carries bounded RELATIVE error — the general-domain
    * complement to `ev_quantile_store`'s exact bounded-domain histogram.
    * Negative values MIRROR the positive bucketing on |v| (bound toward
    * zero), zero is its own bucket — so the table stays ≤ 2·64·2^subBits
    * rows per group even on a negative-heavy column (a raw pass-through
    * would hand every distinct negative its own row: unbounded state in
    * the streaming twin and the persisted store). Bucketing is
    * idempotent on its own outputs on BOTH sign sides, which is what
    * makes store re-folds exact.
    *
    * Every step is integer arithmetic replicable bit-for-bit by another
    * engine — floor(log2 v) comes from the UNPADDED binary-string length
    * (`length(bin(v)) - 1`), never floating log2, whose last-ulp rounding
    * at bucket edges would diverge between libm implementations.
    * (`Long.MinValue`, whose |v| is unrepresentable, falls out of the
    * two's-complement arithmetic as its own bucket — the imperative twin
    * in [[graft.expressions.HdrPercentile]] special-cases it to the same
    * value.) */
  def hdrBucket(v: Column, subBits: Int): Column = {
    require(subBits >= 0 && subBits <= 20, s"subBits out of range: $subBits")
    def pos(x: Column): Column = {
      val e = length(bin(x)).cast("long") - 1L
      val shift = greatest(lit(0L), e - subBits)
      val width = call_function("shiftleft", lit(1L), shift.cast("int"))
      x - pmod(x, width)
    }
    when(v > 0, pos(v)).when(v < 0, -pos(-v)).otherwise(lit(0L))
  }

  /** The mergeable sketch state: (group, bucket) → count. A sum monoid —
    * sketches of disjoint slices union + re-sum to the sketch of the
    * whole (any order, any partitioning), so this table IS the store
    * format for incremental quantile maintenance. ≤ 64·2^subBits buckets
    * per group regardless of data size; one shuffle. */
  def hdrBucketTable(df: DataFrame, group: Column, value: Column,
                     subBits: Int = 5): DataFrame = {
    // the bounded-state story (≤ 64·2^subBits buckets per group) only
    // holds for integral values: bin() would silently truncate a double
    // for the exponent while the pmod ran on the raw fraction, giving
    // every distinct fractional value its own "bucket" — unbounded state
    // in the streaming twin and the persisted store. Scale-and-cast
    // first (e.g. `round(value * 100).cast("long")`).
    import org.apache.spark.sql.types._
    val vt = df.select(value.as("__v")).schema.head.dataType
    val integral = vt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    require(integral,
      s"hdrBucketTable needs an integral value column, got $vt — " +
        "scale and cast first (e.g. round(value * 100).cast(\"long\"))")
    df.select(group.as("g"), hdrBucket(value, subBits).as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("n"))
  }

  /** Merge sketch states (the monoid sum). */
  def hdrMerge(tables: DataFrame*): DataFrame = {
    require(tables.nonEmpty,
      "hdrMerge needs at least one sketch table (the monoid identity is " +
        "an empty (g, b, n) table — pass one explicitly for a dynamic list)")
    tables.reduce(_ unionByName _).groupBy("g", "b")
      .agg(sum("n").as("n"))
  }

  /** p50/p90/p99 (bucket lower bounds — underestimates by < 2⁻ˢᵘᵇᴮⁱᵗˢ
    * relative) + exact n_total per group, from a sketch state: a
    * group-partitioned cumulative walk over the bounded bucket frame —
    * never a data-sized window. */
  def hdrQuantilesFromTable(table: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byB = Window.partitionBy("g").orderBy("b")
    val all = Window.partitionBy("g")
    table
      .withColumn("cum", sum("n").over(byB))
      .withColumn("tot", sum("n").over(all))
      .groupBy("g")
      .agg(
        min(when(col("cum") * 2 >= col("tot"), col("b"))).as("p50_b"),
        min(when(col("cum") * 10 >= col("tot") * 9, col("b"))).as("p90_b"),
        min(when(col("cum") * 100 >= col("tot") * 99, col("b"))).as("p99_b"),
        min("tot").as("n_total"))
  }

  /** One-shot: bucket → count → quantile walk. */
  def hdrQuantiles(df: DataFrame, group: Column, value: Column,
                   subBits: Int = 5): DataFrame =
    hdrQuantilesFromTable(hdrBucketTable(df, group, value, subBits))
}
