package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate store — the materialized-rollup
  * pattern: a 100 TB fact table's `GROUP BY key` summary is computed
  * once, persisted, and kept current by FOLDING each new batch in,
  * instead of re-aggregating the world per refresh.
  *
  * The store is partitioned by a hash bucket of the key, so a merge
  * - aggregates the (small) delta,
  * - reads back ONLY the buckets the delta's keys hash into (an IN-list
  *   partition filter — pruned at file listing),
  * - re-sums store partials with delta partials (sums/counts are
  *   monoidal: partial + partial = whole, any order), and
  * - rewrites ONLY those buckets via dynamic partition overwrite.
  *
  * Cost per refresh ∝ delta + affected buckets — at nBuckets sized so a
  * typical delta touches a fraction of them, the untouched store is
  * never read or written (spec-asserted byte-for-byte).
  *
  * Measures are restricted to sum-monoids (`sum` over caller-prepared
  * columns; counts as `sum(1)`): that is exactly the class for which
  * partial-merge is lossless. Averages derive as sum/count downstream;
  * non-monoidal measures (distinct, medians) need sketch stores (see
  * [[SketchOps]]) — merging raw partials would be wrong, so this API
  * simply doesn't accept them.
  */
object IncrementalAggOps {

  /** Per-measure merge function. Any COMMUTATIVE MONOID whose partial
    * merge is the function itself qualifies: sum (the default), min,
    * max. Partial + partial = whole in any order for all three; only
    * sum additionally supports retraction (inverses exist). */
  private def kindOf(kinds: Seq[String], measures: Seq[String], m: String): String =
    if (kinds.isEmpty) "sum"
    else kinds(measures.indexOf(m)) match {
      case k @ ("sum" | "min" | "max") => k
      case bad => throw new IllegalArgumentException(
        s"unsupported measure kind '$bad' (sum|min|max)")
    }

  private def mergeExpr(kind: String, m: String) = kind match {
    case "sum" => sum(col(m)).as(m)
    case "min" => min(col(m)).as(m)
    case "max" => max(col(m)).as(m)
  }

  private def bucketed(df: DataFrame, keys: Seq[String], measures: Seq[String],
                       nBuckets: Int, kinds: Seq[String]): DataFrame = {
    val exprs = measures.map(m => mergeExpr(kindOf(kinds, measures, m), m))
    df.groupBy(keys.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
      .withColumn("__bucket", pmod(hash(keys.map(col): _*), lit(nBuckets)))
  }

  /** Initial build: aggregate `df` by `keys` (merging each measure
    * column with its kind — all-sum when `kinds` is empty) into a
    * bucket-partitioned store at `basePath`. */
  def writeAggStore(df: DataFrame, spark: SparkSession, basePath: String,
                    keys: Seq[String], measures: Seq[String],
                    nBuckets: Int = 64, kinds: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty && measures.nonEmpty)
    require(kinds.isEmpty || kinds.length == measures.length)
    bucketed(df, keys, measures, nBuckets, kinds)
      .write.mode("overwrite").partitionBy("__bucket").parquet(basePath)
    spark.catalog.refreshByPath(basePath)
  }

  /** Fold a new batch in. Only the delta's buckets are read, re-summed
    * and rewritten (dynamic partition overwrite); every other bucket's
    * files are untouched. NOT idempotent — a batch must be merged
    * exactly once (it is a fold, not an upsert of absolutes). */
  def mergeIntoAggStore(delta: DataFrame, spark: SparkSession,
                        basePath: String, keys: Seq[String],
                        measures: Seq[String], nBuckets: Int = 64,
                        kinds: Seq[String] = Nil): Unit = {
    require(kinds.isEmpty || kinds.length == measures.length)
    val dAgg = bucketed(delta, keys, measures, nBuckets, kinds)
      // freeze before reading the store this write will mutate
      .localCheckpoint(true)
    val touched = dAgg.select("__bucket").distinct()
      .collect().map(_.getInt(0)) // bounded by nBuckets, never data-sized
    val affected = spark.read.parquet(basePath)
      .filter(col("__bucket").isin(touched.toIndexedSeq: _*))
    val exprs = measures.map(m => mergeExpr(kindOf(kinds, measures, m), m))
    val merged = affected.unionByName(dAgg)
      .groupBy((keys :+ "__bucket").map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
      .select((keys ++ measures :+ "__bucket").map(col): _*)
      // materialize BEFORE the write: the write overwrites the very
      // partitions `affected` reads — without the eager cut the job
      // would consume files it is deleting (bounded: affected slice
      // of an already-aggregated store, not fact-table-sized)
      .localCheckpoint(true)
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket").parquet(basePath)
    spark.catalog.refreshByPath(basePath)
  }

  /** Retract a previously-merged batch — the payoff of restricting
    * measures to sum-monoids: deletion is just merging the NEGATION, so
    * it inherits the merge's bucket locality for free. The batch must
    * be exactly what was merged (a fold, like the merge itself).
    * Keys whose counts reach zero keep a zero row — a groupBy consumer
    * sees an empty group either way; compact by rebuilding when zero
    * rows accumulate. */
  def retractFromAggStore(batch: DataFrame, spark: SparkSession,
                          basePath: String, keys: Seq[String],
                          measures: Seq[String],
                          nBuckets: Int = 64,
                          kinds: Seq[String] = Nil): Unit = {
    // retraction = merging the negation, which is only meaningful for
    // sum partials: a min/max partial is not invertible, and silently
    // summing against one would corrupt the stored extreme
    require(kinds.isEmpty || kinds.forall(_ == "sum"),
      s"retractFromAggStore supports sum measures only, got $kinds — " +
        "rebuild min/max stores instead of retracting from them")
    mergeIntoAggStore(
      batch.select((keys.map(col) ++
        measures.map(m => negate(col(m)).as(m))): _*),
      spark, basePath, keys, measures, nBuckets)
  }

  /** Retraction and merge as ONE bucket-local fold — the change-feed
    * maintenance step (see the pipeline_cdc_rollup gate): a CDC diff
    * yields old rows to retract and new rows to fold in, and since both
    * are sum-monoid folds they compose into a single pass over
    * `(−old) ∪ new` — one delta aggregation, one affected-bucket read,
    * one dynamic-partition rewrite, instead of running the whole
    * read-modify-write cycle twice. Same exactness (sums commute);
    * sum-only, like [[retractFromAggStore]]. */
  def applyDiffToAggStore(oldRows: DataFrame, newRows: DataFrame,
                          spark: SparkSession, basePath: String,
                          keys: Seq[String], measures: Seq[String],
                          nBuckets: Int = 64): Unit = {
    val cols = (keys ++ measures).map(col)
    mergeIntoAggStore(
      oldRows.select((keys.map(col) ++
        measures.map(m => negate(col(m)).as(m))): _*)
        .unionByName(newRows.select(cols: _*)),
      spark, basePath, keys, measures, nBuckets)
  }

  /** The current rollup (all buckets). */
  def readAggStore(spark: SparkSession, basePath: String): DataFrame =
    spark.read.parquet(basePath).drop("__bucket")

  // ------------------------------------------------- HDR quantile stores

  /** Store column names of an HDR rollup: the bucket lower bound and its
    * count. One HDR value column per store (register another store for a
    * second value) — shared with [[graft.plans.AggStoreRewrite]]. */
  val HdrBucketCol = "__hdr_b"
  val HdrCountCol = "__hdr_n"

  private def hdrFrame(df: DataFrame, keys: Seq[String], valueCol: String,
                       subBits: Int): DataFrame =
    df.select((keys.map(col) :+
        SketchOps.hdrBucket(col(valueCol), subBits).as(HdrBucketCol)): _*)
      .groupBy((keys :+ HdrBucketCol).map(col): _*)
      .agg(count(lit(1)).as(HdrCountCol))

  /** Build an HDR-sketch rollup: per (keys, log2-sub-bucket) counts —
    * a sum monoid over the (keys, bucket) grain, so the generic agg
    * store maintains it with bucket-local merges, and
    * `hdr_percentile(valueCol, p)` queries over the fact table are
    * servable from it at query-rewrite level (register via
    * [[graft.plans.AggStoreRegistry.register]] with kind `hdr`).
    * State per key is bounded by 64·2^subBits buckets at any corpus
    * size. `valueCol` must be integral (see SketchOps.hdrBucketTable). */
  def writeHdrStore(df: DataFrame, spark: SparkSession, basePath: String,
                    keys: Seq[String], valueCol: String,
                    nBuckets: Int = 64, subBits: Int = 5): Unit =
    writeAggStore(hdrFrame(df, keys, valueCol, subBits), spark, basePath,
      keys :+ HdrBucketCol, Seq(HdrCountCol), nBuckets)

  /** Fold a new batch into an HDR rollup (bucket-local, like every
    * agg-store merge; counts are sums, so the fold is exact). */
  def mergeIntoHdrStore(delta: DataFrame, spark: SparkSession,
                        basePath: String, keys: Seq[String],
                        valueCol: String, nBuckets: Int = 64,
                        subBits: Int = 5): Unit =
    mergeIntoAggStore(hdrFrame(delta, keys, valueCol, subBits), spark,
      basePath, keys :+ HdrBucketCol, Seq(HdrCountCol), nBuckets)

  // ------------------------------------------- CMS point-frequency stores

  /** Store column names of a CMS rollup: the flattened counter position
    * (`hash_row · w + bucket`) and its count. */
  val CmsPosCol = "__cms_p"
  val CmsCountCol = "__cms_n"

  /** The relational form of a CMS: per (keys, counter-position) counts.
    * Positions come from [[SketchOps.cmsPositions]] (the shared
    * `pmod(xxhash64(i, key), w)` definition), so the stored rows ARE the
    * sketch's counters — and because counters are plain sums, the
    * incrementally-folded store equals the one-shot sketch EXACTLY
    * (integer equality, spec-pinned), which is precisely what
    * [[graft.plans.AggStoreRewrite]]'s `hll` rejection note says no
    * union-of-registers sketch can claim. */
  private def cmsFrame(df: DataFrame, keys: Seq[String], keyCol: String,
                       d: Int, w: Int): DataFrame =
    df.select((keys.map(col) :+
        posexplode(SketchOps.cmsPositions(col(keyCol).cast("string"), d, w))): _*)
      .select((keys.map(col) :+
        (col("pos") * w + col("col")).cast("int").as(CmsPosCol)): _*)
      .groupBy((keys :+ CmsPosCol).map(col): _*)
      .agg(count(lit(1)).as(CmsCountCol))

  /** Build a CMS frequency rollup: point-frequency estimates for ANY
    * key become servable from ≤ d stored rows per probe, over a store
    * bounded by |groups|·d·w rows at any corpus size. */
  def writeCmsStore(df: DataFrame, spark: SparkSession, basePath: String,
                    keys: Seq[String], keyCol: String,
                    d: Int = 4, w: Int = 16384,
                    nBuckets: Int = 64): Unit =
    writeAggStore(cmsFrame(df, keys, keyCol, d, w), spark, basePath,
      keys :+ CmsPosCol, Seq(CmsCountCol), nBuckets)

  /** Fold a batch in (counter sums — exact, any order). Like every
    * agg-store merge this is a FOLD, not an upsert: a replayed batch
    * double-counts, so at-least-once streams need upstream idempotence
    * (the manifest-tagged stores' replay guard has no analog here). */
  def mergeIntoCmsStore(delta: DataFrame, spark: SparkSession,
                        basePath: String, keys: Seq[String], keyCol: String,
                        d: Int = 4, w: Int = 16384,
                        nBuckets: Int = 64): Unit =
    mergeIntoAggStore(cmsFrame(delta, keys, keyCol, d, w), spark, basePath,
      keys :+ CmsPosCol, Seq(CmsCountCol), nBuckets)

  /** Retract a previously-merged batch — counters subtract exactly, so
    * CMS inherits the sum-store's compliance-deletion path (HLL can't:
    * register max has no inverse). */
  def retractFromCmsStore(batch: DataFrame, spark: SparkSession,
                          basePath: String, keys: Seq[String],
                          keyCol: String, d: Int = 4, w: Int = 16384,
                          nBuckets: Int = 64): Unit =
    retractFromAggStore(cmsFrame(batch, keys, keyCol, d, w), spark, basePath,
      keys :+ CmsPosCol, Seq(CmsCountCol), nBuckets)

  /** Point-frequency estimates served FROM the store: each candidate
    * key probes its d counter rows (left join — an absent row is a zero
    * counter) and takes the min. `candidates` must carry the group-key
    * columns (if any) plus `keyCol`; output is one row per distinct
    * (group, key) with `est_n`. Estimates from an incrementally-built
    * store equal the one-shot sketch's — counters are sums. */
  def cmsEstimateFromStore(candidates: DataFrame, spark: SparkSession,
                           basePath: String, keys: Seq[String],
                           keyCol: String, d: Int = 4,
                           w: Int = 16384): DataFrame = {
    val store = readAggStore(spark, basePath)
    val probes = candidates
      .select((keys.map(col) :+ col(keyCol)): _*).distinct()
      .select((keys.map(col) :+ col(keyCol) :+
        posexplode(SketchOps.cmsPositions(col(keyCol).cast("string"), d, w))): _*)
      .select((keys.map(col) :+ col(keyCol) :+
        (col("pos") * w + col("col")).cast("int").as(CmsPosCol)): _*)
    probes.join(store, (keys :+ CmsPosCol).toIndexedSeq, "left")
      .groupBy((keys :+ keyCol).map(col): _*)
      .agg(min(coalesce(col(CmsCountCol), lit(0L))).as("est_n"))
  }

  /** Retract a previously-merged batch from an HDR rollup — the bucket
    * counts are sums, so deletion (compliance removals, bad-batch
    * rollback) inherits [[retractFromAggStore]]'s bucket locality; no
    * other quantile sketch family is subtractable at all. The batch must
    * be exactly what was merged. Zero-count bucket rows may remain
    * (harmless to the rank walk — they add nothing to cum or tot);
    * rebuild to compact. */
  def retractFromHdrStore(batch: DataFrame, spark: SparkSession,
                          basePath: String, keys: Seq[String],
                          valueCol: String, nBuckets: Int = 64,
                          subBits: Int = 5): Unit =
    retractFromAggStore(hdrFrame(batch, keys, valueCol, subBits), spark,
      basePath, keys :+ HdrBucketCol, Seq(HdrCountCol), nBuckets)
}
