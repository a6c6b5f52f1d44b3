package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed row store maintained by CHANGELOG APPLY — the lakehouse
  * MERGE/CDC pattern (Delta `MERGE INTO`, Iceberg upsert, Hudi
  * copy-on-write) expressed as plain Spark over plain parquet: a 100 TB
  * corpus's canonical "current rows" table is kept up to date by folding
  * in batches of keyed changes (upserts + deletes tagged with a
  * monotonic sequence number) instead of rewriting the world.
  *
  * Layout: rows partitioned by `__bucket = pmod(hash(key), nBuckets)`.
  * An apply
  *  - elects one WINNER per key within the batch (highest `seqCol`;
  *    equal sequences prefer the delete — a total order, so the
  *    election is associative and batches can be split or coalesced
  *    freely),
  *  - reads back ONLY the buckets the winners hash into (partition
  *    pruning at file listing),
  *  - re-elects per key between store row and winner — a store row
  *    carries the sequence AND op that produced it, so a LATE-ARRIVING
  *    change older than the stored row loses, which makes apply
  *    idempotent (re-applying any already-applied batch is a no-op) and
  *    out-of-order-safe, unlike the [[IncrementalAggOps]] fold — and
  *  - rewrites only those buckets via dynamic partition overwrite.
  *
  * Deletes persist as TOMBSTONES (the winning row with its `__op = D`,
  * filtered out of every read): physically dropping the row would
  * forget the delete's sequence, and a stale update arriving in a LATER
  * batch would silently resurrect it (DocStoreProps pins exactly this).
  * `compactDocStore` physically drops tombstones — run it only once no
  * out-of-order change older than a tombstone can still arrive.
  *
  * Cost per apply ∝ batch + affected buckets; untouched buckets are
  * never read or written (spec-asserted byte-for-byte in DocStoreSpec).
  * Size `nBuckets` so one bucket ≪ executor memory at the target
  * corpus: the rewrite is per-bucket-local, never corpus-wide.
  *
  * Point/batch lookup prunes to the requested keys' buckets — a
  * key-hash store read is O(batch + matching buckets), not a scan.
  *
  * Durability stance, stated plainly: this is the IN-PLACE half of the
  * store pair. Dynamic partition overwrite rewrites touched buckets
  * where they stand, so a crash mid-apply can leave some buckets on
  * the new state and others on the old — recoverable (the LWW
  * election makes re-applying the same batch a value-level no-op; run
  * the apply again) but BRIEFLY INCONSISTENT to a concurrent reader,
  * and exposed to the committer's delete-then-rename window inside a
  * single bucket. Workloads that need crash-ATOMIC visibility or
  * readers isolated from in-flight applies use [[VersionedStoreOps]],
  * the copy-on-write sibling with the same election semantics: applies
  * only ADD `v=N` directories and one manifest row, so nothing a
  * reader resolves is ever rewritten. The price is version storage
  * until `vacuum`. Pick per table: hot high-churn state in-place,
  * anything serving concurrent readers versioned.
  *
  * Lineage-cut stance (shared by every store op in this family): the
  * in-apply freeze primitive is `localCheckpoint` — executor blocks,
  * the right/fastest cut in local mode and on a healthy cluster, but
  * NOT durable: on a real cluster an executor loss mid-apply kills the
  * lineage-truncated frame and the apply must be re-run (safe — every
  * mutation here is idempotent by the election/replay contracts, so
  * "re-run the batch" is the documented recovery, exactly the
  * [[GraphOps]] trade). A deployment that cannot tolerate mid-mutation
  * retries should set `spark.checkpoint.dir` and route the cut through
  * reliable `checkpoint()` (the GraphOps `checkpointDir` pattern) —
  * at the cost of a DFS write per apply; the local default is the
  * measured-faster path everywhere else.
  */
object DocStoreOps {

  private[ops] val OP = "__op"
  private[ops] val BUCKET = "__bucket"

  private[ops] def withBucket(df: DataFrame, key: String, nBuckets: Int): DataFrame =
    df.withColumn(BUCKET, pmod(hash(col(key)), lit(nBuckets)))

  /** One row per key: highest sequence wins; equal sequences prefer the
    * delete (an explicit boolean rank — the op strings themselves don't
    * order usefully); rows still tied (two upserts sharing a sequence)
    * fall through to the GREATEST payload by field-ordered struct
    * comparison, so the order is TOTAL and VALUE-determined — without
    * it, row_number picks an execution-dependent winner and splitting a
    * batch across two applies could land on a different final payload
    * than applying it whole, breaking the associativity/idempotence
    * contract. (An arrival-order rule like first-writer-wins cannot
    * exist here at all: out-of-order batch delivery is the premise.)
    * Non-orderable payload columns (maps) are excluded from the
    * tiebreaker; identical remaining rows tie harmlessly. */
  private[ops] def electWinners(rows: DataFrame, key: String, seqCol: String): DataFrame = {
    val tieCols = rows.schema.fields
      .filter(f => f.name != OP && f.name != BUCKET &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(_.name).sorted.toIndexedSeq
    val w = Window.partitionBy(col(key))
      .orderBy(col(seqCol).desc, (col(OP) === "D").desc,
        struct(tieCols.map(col): _*).desc)
    rows.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Initial build: `df`'s rows (current versions, one per key, with
    * their producing sequence in `seqCol`) written bucket-partitioned. */
  def writeDocStore(df: DataFrame, spark: SparkSession, basePath: String,
                    key: String, seqCol: String, nBuckets: Int = 64): Unit = {
    withBucket(df.withColumn(OP, lit("U")), key, nBuckets)
      .write.mode("overwrite").partitionBy(BUCKET).parquet(basePath)
    spark.catalog.refreshByPath(basePath)
  }

  /** Apply a batch of changes: columns = store payload + `seqCol` +
    * `opCol` ("U" upsert / "D" delete). Idempotent and out-of-order-safe
    * per the LWW election above. */
  def applyChanges(changes: DataFrame, spark: SparkSession, basePath: String,
                   key: String, seqCol: String, opCol: String,
                   nBuckets: Int = 64): Unit = {
    val batch = withBucket(changes.withColumnRenamed(opCol, OP), key, nBuckets)
    // touched buckets come off the RAW batch with one map-side-partial
    // aggregate: the election keeps (at least) one winner per key, so
    // winners' bucket set ≡ the batch's — probing the batch instead of
    // a materialized winner frame drops the old shape's per-apply
    // window pass + eager checkpoint over the batch. (`changes` is
    // evaluated twice — probe + election — which the apply contract
    // already assumes is safe: a crash-retry re-evaluates it too.)
    val touched = batch.select(BUCKET).distinct()
      .collect().map(_.getInt(0)) // bounded by nBuckets, never batch-sized
    if (touched.isEmpty) return // empty batch: nothing to elect or rewrite
    // store rows carry their own OP (tombstones included), so the
    // election sees deletes' sequences and stale resurrections lose.
    // mergeSchema + allowMissingColumns = SCHEMA EVOLUTION: a batch may
    // add payload columns; rewritten buckets carry the widened schema,
    // untouched buckets keep theirs, and rows from before the column
    // existed read as null (spec-pinned).
    val affected = spark.read.option("mergeSchema", "true").parquet(basePath)
      .filter(col(BUCKET).isin(touched.toIndexedSeq: _*))
    // ONE election over (store slice ∪ raw batch): the old within-batch
    // election followed by a re-election against the store composes into
    // a single election because the winner order is TOTAL and the
    // election associative (electWinners doc) — same winners, one window
    // pass instead of two. The bucket IN-filter is pure insurance: no
    // bucket outside the probed set may ever be dynamically overwritten
    // (it would replace store rows that were never read back).
    val merged = electWinners(
      affected.unionByName(batch, allowMissingColumns = true), key, seqCol)
      .filter(col(BUCKET).isin(touched.toIndexedSeq: _*))
      // materialize BEFORE overwriting the partitions `affected` reads
      // (bounded: the touched slice of the store plus the batch)
      .localCheckpoint(true)
    // every touched bucket keeps at least its winners (tombstones are
    // rows, not absences), so dynamic overwrite rewrites exactly the
    // touched partitions and no bucket can silently vanish
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BUCKET).parquet(basePath)
    spark.catalog.refreshByPath(basePath)
  }

  /** Physically drop tombstones (full rewrite of every bucket that
    * holds one; buckets left row-empty are removed). ONLY safe once no
    * out-of-order change older than any tombstone can still arrive —
    * after compaction a stale update for a compacted key would
    * resurrect it. */
  def compactDocStore(spark: SparkSession, basePath: String): Unit =
    rewriteBuckets(spark, basePath, dropCond = col(OP) === "D")

  /** The shared bucket-rewrite protocol: find the buckets holding any
    * row matching `dropCond`, rewrite ONLY those buckets without the
    * matching rows (checkpoint-fenced dynamic partition overwrite), and
    * physically remove buckets the rewrite emptied (a row-empty bucket
    * writes no partition, so its stale files would otherwise survive).
    * One implementation for compaction and retention purge — the
    * protocol must never diverge between them. */
  private def rewriteBuckets(spark: SparkSession, basePath: String,
                             dropCond: org.apache.spark.sql.Column): Unit = {
    val all = spark.read.option("mergeSchema", "true").parquet(basePath)
    val hitCond = coalesce(dropCond, lit(false))
    val hit = all.filter(hitCond)
      .select(BUCKET).distinct().collect().map(_.getInt(0))
    if (hit.nonEmpty) {
      val kept = all.filter(col(BUCKET).isin(hit.toIndexedSeq: _*))
        .filter(!hitCond)
        .localCheckpoint(true) // freeze before overwriting what it reads
      kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET).parquet(basePath)
      val surviving = kept.select(BUCKET).distinct()
        .collect().map(_.getInt(0)).toSet
      val fs = new org.apache.hadoop.fs.Path(basePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (hit.toSet -- surviving).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$basePath/$BUCKET=$b"), true)
      }
      spark.catalog.refreshByPath(basePath)
    }
  }

  /** Physical retention purge — the right-to-be-forgotten path: every
    * stored row (live or tombstone) whose payload matches `cond` is
    * removed, rewriting only the buckets that hold a match (emptied
    * buckets dropped). Rows where `cond` evaluates to null are KEPT —
    * a predicate that cannot decide must not delete. Like
    * [[compactDocStore]], purging forgets sequences: a late stale
    * change for a purged key can re-insert it, so purge past the
    * reorder horizon (or route the purge through a delete changelog
    * when LWW protection must hold). */
  def purgeWhere(spark: SparkSession, basePath: String,
                 cond: org.apache.spark.sql.Column): Unit =
    rewriteBuckets(spark, basePath, dropCond = cond)

  /** Constraint-enforced apply — the dead-letter pattern: changes
    * violating any expectation are DIVERTED to `quarantinePath`
    * (appended, stamped with the violated rule names) instead of
    * corrupting the store; the clean remainder applies normally.
    * Expectations are (name, predicate-that-must-hold) pairs evaluated
    * per change row; deletes are exempt from payload rules by passing
    * predicates of the form `op =!= "D" implies ...` — the caller owns
    * that choice. Returns (applied, quarantined) counts. */
  def applyChangesChecked(changes: DataFrame, spark: SparkSession,
                          basePath: String, key: String, seqCol: String,
                          opCol: String,
                          expectations: Seq[(String, org.apache.spark.sql.Column)],
                          quarantinePath: String,
                          nBuckets: Int = 64): (Long, Long) = {
    require(expectations.nonEmpty)
    // a predicate that cannot DECIDE (null — typically the null payloads
    // expectations exist to screen) counts as VIOLATED: a gate's safe
    // default is quarantine, the mirror of purgeWhere's keep-on-null
    val violated = array(expectations.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*)
    val tagged = changes
      .withColumn("__violations", filter(violated, v => v.isNotNull))
      .localCheckpoint(true) // one evaluation feeds both branches
    val bad = tagged.filter(size(col("__violations")) > 0)
    val good = tagged.filter(size(col("__violations")) === 0)
      .drop("__violations")
    val nBad = bad.count()
    if (nBad > 0)
      bad.write.mode("append").parquet(quarantinePath)
    val nGood = good.count()
    if (nGood > 0)
      applyChanges(good, spark, basePath, key, seqCol, opCol, nBuckets)
    tagged.unpersist()
    (nGood, nBad)
  }

  /** Current rows (all buckets; tombstones filtered; schemas of
    * different bucket generations merged). */
  def readDocStore(spark: SparkSession, basePath: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(basePath)
      .filter(col(OP) =!= "D").drop(OP, BUCKET)

  /** Rows for the given keys, reading only the buckets they hash into:
    * the distinct-bucket set (bounded by nBuckets) becomes a partition
    * IN-filter — pruned at file listing, then a semi join restricts to
    * the exact keys. `keys` is a one-column DataFrame of key values. */
  def lookupKeys(spark: SparkSession, basePath: String, keys: DataFrame,
                 key: String, nBuckets: Int = 64): DataFrame = {
    val k = keys.toDF(key)
    val buckets = withBucket(k, key, nBuckets)
      .select(BUCKET).distinct().collect().map(_.getInt(0))
    spark.read.option("mergeSchema", "true").parquet(basePath)
      .filter(col(BUCKET).isin(buckets.toIndexedSeq: _*))
      .filter(col(OP) =!= "D")
      .join(k, Seq(key), "left_semi")
      .drop(OP, BUCKET)
  }

  // ---------------------------------------- secondary attribute index

  /** Build a secondary index over one payload attribute: postings
    * `(attr, key)` bucket-partitioned by the ATTRIBUTE's hash, so an
    * attribute lookup prunes to the requested values' buckets the same
    * way a key lookup prunes the primary.
    *
    * The index OVER-APPROXIMATES by design: [[appendToAttrIndex]] only
    * ever appends (an upsert adds its new posting; nothing removes the
    * old-attribute posting or a deleted key's), and [[lookupByAttr]]
    * READ-REPAIRS — candidate keys are fetched from the primary
    * (bucket-pruned) and only rows whose CURRENT attribute matches
    * survive. So correctness never depends on index freshness: the
    * primary is truth, the index is pure pruning, and maintenance needs
    * no pre-image lookups or cross-bucket tombstones (the costs that
    * make synchronously-exact secondary indexes hard). Rebuild when
    * stale mass accumulates; answers stay exact before that — lookups
    * just touch more candidate keys. */
  def buildAttrIndex(spark: SparkSession, storeBase: String,
                     indexBase: String, key: String, attr: String,
                     nBuckets: Int = 64): Unit = {
    withBucket(readDocStore(spark, storeBase).select(col(attr), col(key)),
      attr, nBuckets)
      .write.mode("overwrite").partitionBy(BUCKET).parquet(indexBase)
    spark.catalog.refreshByPath(indexBase)
  }

  /** Append a change batch's postings: upserts only (a delete leaves
    * its stale posting for read-repair to skip — absence of the key in
    * the primary IS the repair). */
  def appendToAttrIndex(changes: DataFrame, spark: SparkSession,
                        indexBase: String, key: String, attr: String,
                        opCol: String, nBuckets: Int = 64): Unit = {
    withBucket(changes.filter(col(opCol) === "U").select(col(attr), col(key)),
      attr, nBuckets)
      .write.mode("append").partitionBy(BUCKET).parquet(indexBase)
    spark.catalog.refreshByPath(indexBase)
  }

  /** [[applyChanges]] + index posting append, the maintained pair. */
  def applyChangesIndexed(changes: DataFrame, spark: SparkSession,
                          storeBase: String, indexBase: String, key: String,
                          seqCol: String, opCol: String, attr: String,
                          nBuckets: Int = 64): Unit = {
    applyChanges(changes, spark, storeBase, key, seqCol, opCol, nBuckets)
    appendToAttrIndex(changes, spark, indexBase, key, attr, opCol, nBuckets)
  }

  /** Current rows whose `attr` is in `values` (a one-column DataFrame),
    * reading only (a) the index buckets those values hash into and
    * (b) the primary buckets the candidate keys hash into — never a
    * store scan. The final semi join is the read-repair: a stale
    * posting's key either no longer matches the attribute or is gone
    * from the primary, and drops out either way. */
  def lookupByAttr(spark: SparkSession, storeBase: String, indexBase: String,
                   key: String, attr: String, values: DataFrame,
                   nBuckets: Int = 64): DataFrame = {
    val v = values.toDF(attr)
    val buckets = withBucket(v, attr, nBuckets)
      .select(BUCKET).distinct().collect().map(_.getInt(0))
    val cand = spark.read.parquet(indexBase)
      .filter(col(BUCKET).isin(buckets.toIndexedSeq: _*))
      .join(broadcast(v), Seq(attr), "left_semi")
      .select(key).distinct()
    lookupKeys(spark, storeBase, cand, key, nBuckets)
      .join(broadcast(v), Seq(attr), "left_semi")
  }

  /** Single-key convenience over [[lookupKeys]]. */
  def lookup(spark: SparkSession, basePath: String, key: String,
             value: Long, nBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    lookupKeys(spark, basePath, Seq(value).toDF(key), key, nBuckets)
  }

  /** Continuous CDC ingest: apply each micro-batch of a streaming
    * changelog to the store. Per-batch cost inherits the bucket
    * locality of [[applyChanges]]; the LWW election makes replayed
    * batches (at-least-once sources) harmless. With `expectations`,
    * each micro-batch goes through [[applyChangesChecked]] instead —
    * violating changes land in `quarantinePath` and never reach the
    * store, continuously. */
  def cdcSink(changes: DataFrame, basePath: String, key: String,
              seqCol: String, opCol: String, nBuckets: Int = 64,
              checkpoint: Option[String] = None,
              expectations: Seq[(String, org.apache.spark.sql.Column)] = Nil,
              quarantinePath: Option[String] = None) = {
    require(expectations.isEmpty == quarantinePath.isEmpty,
      "expectations and quarantinePath come together")
    val w = changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (expectations.isEmpty)
            applyChanges(batch, batch.sparkSession, basePath,
              key, seqCol, opCol, nBuckets)
          else {
            val _ = applyChangesChecked(batch, batch.sparkSession, basePath,
              key, seqCol, opCol, expectations, quarantinePath.get, nBuckets)
          }
        }
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
