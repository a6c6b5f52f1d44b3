package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN view — the delta-join rule of classic
  * incremental view maintenance, the join-shaped sibling of
  * [[IncrementalAggOps]]: a 100 TB `A ⋈ B` is joined once, persisted,
  * and kept current under APPEND-ONLY batches by
  *
  *   ΔJ  =  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * (A, B are the pre-append states; the three terms partition the new
  * pairs, so J ∪ ΔJ is exactly (A∪ΔA) ⋈ (B∪ΔB) with no dedup pass).
  *
  * All three tables live bucket-partitioned by the join key's hash, so
  * a refresh joins each delta against ONLY the buckets its keys hash
  * into and APPENDS — nothing is ever rewritten, and the delta⋈delta
  * term is delta-sized. Cost per refresh ∝ deltas + matching buckets;
  * the rest of A, B and J is never read or written (spec-asserted
  * byte-for-byte).
  *
  * Durability: every refresh is MANIFEST-COMMITTED, the same
  * write-ahead shape as [[VectorStoreOps]]. Data lives under
  * `side/c=<commit>/__bucket=<b>/` (side ∈ a, b, j) and one `_manifest`
  * parquet of `(c, side, bucket, tag)` rows names the live
  * directories; reads resolve the manifest and never list the side
  * trees. A refresh writes ΔA, ΔB and ΔJ as commit `N` of their sides
  * FIRST and publishes all three with ONE manifest append — so a crash
  * anywhere inside the multi-table apply leaves nothing visible, and a
  * retry overwrites the torn commit directories at the same id before
  * publishing. The optional `tag` (a Structured Streaming batch id)
  * rides the same manifest rows, making streamed refreshes exactly-once
  * ([[joinViewSinkA]]): the one append is simultaneously the data
  * commit and the replay marker. Compaction rewrites fragmented buckets
  * into a new commit per side, swaps the manifest (tags preserved as
  * `bucket = -1` markers when their data rows are superseded), then
  * GCs.
  *
  * Inner equi-join, append-only sides (retraction of join rows needs
  * multiplicity bookkeeping — out of scope here; use the
  * [[DocStoreOps]] LWW store when rows change in place). Column names
  * besides the key must be disjoint across A and B; A-side and ΔA
  * schemas match (same for B). Single writer at a time, as in the
  * sibling stores.
  *
  * Durability contract of record: `graft.ops.StoreContractSpec` —
  * the cross-family property suite every persisted store passes
  * (replay no-op, torn-write invisibility, RTBF permanence through
  * rebuild + replay, rebuild answer-preservation).
  */
object IncrementalJoinOps {

  private val BUCKET = "__bucket"
  private val Sides = Seq("a", "b", "j")

  private def manifestPath(base: String) = s"$base/_manifest"
  private def schemaPath(base: String, side: String) = s"$base/$side/_schema"

  /** A side's schema as an empty frame, from its side-car — no data-dir
    * listing, valid even when the side holds zero live rows. */
  private def emptySide(spark: SparkSession, base: String, side: String): DataFrame =
    spark.read.parquet(schemaPath(base, side)).filter(lit(false))

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (commit, side, bucket, tag); `bucket = -1` rows are pure tag
    * markers kept when a tagged commit's data dirs are compacted away
    * (the replay guard must outlive the data it guarded). */
  private final case class ManifestRow(c: Long, side: String, bucket: Int,
                                       tag: Option[Long])

  private def manifestExists(spark: SparkSession, base: String): Boolean =
    graft.util.ManifestIO.exists(spark, manifestPath(base))

  private def readManifest(spark: SparkSession, base: String): Array[ManifestRow] = {
    if (!manifestExists(spark, base)) Array.empty
    else graft.util.ManifestIO.read(spark, manifestPath(base))
      .select("c", "side", "bucket", "tag")
      .collect().map(r => ManifestRow(r.getLong(0), r.getString(1),
        r.getInt(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
  }

  /** Publish manifest rows through [[graft.util.ManifestIO]] (shared
    * with [[VectorStoreOps]] so the swap semantics can't drift):
    * appends land inside the live manifest version, full rewrites swap
    * in a NEW version beside it — a crash mid-swap leaves the prior
    * committed manifest live instead of bricking the view. */
  private def writeManifest(spark: SparkSession, base: String,
                            rows: Seq[ManifestRow], append: Boolean): Unit = {
    import spark.implicits._
    val df = rows.map(r => (r.c, r.side, r.bucket, r.tag))
      .toDF("c", "side", "bucket", "tag")
    // only the manifest's own listing can go stale: data commits land in
    // NEW directories (never cached before they're in the manifest), and
    // dirs dropped from the manifest are never resolved again — a
    // whole-base refresh would just re-list every live dir per refresh
    if (append) graft.util.ManifestIO.append(spark, manifestPath(base), df)
    else graft.util.ManifestIO.swap(spark, manifestPath(base), df)
  }

  private def withBucket(df: DataFrame, key: String, nBuckets: Int): DataFrame =
    df.withColumn(BUCKET, pmod(hash(col(key)), lit(nBuckets)))

  /** Buckets a just-written commit directory materialized — one
    * driver-side listing, bounded by nBuckets. */
  private def writtenBuckets(spark: SparkSession, commitDir: String): Seq[Int] = {
    val fs = hadoopFs(spark, commitDir)
    val p = new org.apache.hadoop.fs.Path(commitDir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$BUCKET="))
      .map(_.getPath.getName.stripPrefix(s"$BUCKET=").toInt)
  }

  /** A side's live rows, optionally restricted to `buckets` — the
    * restriction prunes at DIR-RESOLUTION time (only the touched
    * buckets' directories are even listed). `like` supplies the schema
    * when no live dir matches (sides and their deltas share schemas by
    * contract). */
  private def readSideLive(spark: SparkSession, base: String, side: String,
                           manifest: Array[ManifestRow],
                           buckets: Option[Set[Int]],
                           like: => DataFrame): DataFrame = {
    val dirs = manifest
      .filter(r => r.side == side && r.bucket >= 0 &&
        buckets.forall(_.contains(r.bucket)))
      .map(r => s"$base/$side/c=${r.c}/$BUCKET=${r.bucket}")
    if (dirs.isEmpty) like.filter(lit(false))
    else spark.read.option("basePath", s"$base/$side")
      .parquet(dirs.toIndexedSeq: _*)
      .drop("c", BUCKET)
  }

  /** Initial build: persists `a`, `b` and their join under `base` as
    * commit 0 of each side, published by one manifest write. Overwrite
    * semantics — any prior view at the path is removed first. */
  def writeJoinView(a: DataFrame, b: DataFrame, spark: SparkSession,
                    base: String, key: String, nBuckets: Int = 64): Unit = {
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared == Set(key),
      s"sides must share only the join key, got $shared")
    // "c" and "__bucket" are the layout's partition columns: a data
    // column with either name would be shadowed by the directory value
    // on read and then dropped — reject loudly instead
    val reserved = (a.columns ++ b.columns).toSet.intersect(Set("c", BUCKET))
    require(reserved.isEmpty,
      s"column name(s) $reserved are reserved by the view's layout")
    val fs = hadoopFs(spark, base)
    fs.delete(new org.apache.hadoop.fs.Path(manifestPath(base)), true)
    Sides.foreach(s =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/$s"), true))
    // the three sides' builds are INDEPENDENT jobs writing disjoint
    // paths — submit them concurrently so each job's task tail
    // back-fills the next (the manifest, the single commit point,
    // still lands once and last)
    val sides = IndexedSeq(("a", a), ("b", b), ("j", a.join(b, key)))
    val rowsBySide = new Array[Seq[ManifestRow]](sides.size)
    graft.util.Par.run(sides.zipWithIndex.map { case ((side, df), i) => () => {
      // schema side-car: one empty parquet footer per side, so empty
      // live-dir resolutions (empty initial join, all-empty refreshes,
      // the streamed path's ΔB) get the TRUE schema without listing a
      // single data directory
      df.limit(0).coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(schemaPath(base, side))
      val dir = s"$base/$side/c=0"
      withBucket(df, key, nBuckets)
        .write.mode(SaveMode.Overwrite).partitionBy(BUCKET).parquet(dir)
      rowsBySide(i) =
        writtenBuckets(spark, dir).map(bk => ManifestRow(0L, side, bk, None))
    }}: _*)
    writeManifest(spark, base, rowsBySide.toIndexedSeq.flatten, append = false)
  }

  /** Fold new rows into both sides and the view. Either delta may be
    * empty. Only buckets the deltas' keys hash into are read; the three
    * commit directories land first, ONE manifest append publishes them
    * (with `tag` when the refresh is a streamed batch). */
  def appendToJoinView(dA: DataFrame, dB: DataFrame, spark: SparkSession,
                       base: String, key: String, nBuckets: Int = 64,
                       tag: Option[Long] = None): Unit = {
    require(manifestExists(spark, base),
      s"no join view at $base — writeJoinView first")
    applyManifest(dA, dB, spark, base, key, nBuckets, tag,
      readManifest(spark, base))
  }

  /** The refresh against an already-read manifest — each public entry
    * reads the manifest exactly once and threads it here (the tagged
    * streaming path would otherwise pay two collects per batch).
    *
    * Plan shape: the two DELTA COMMIT DIRECTORIES land first (their
    * writes are independent jobs, submitted concurrently so one's task
    * tail back-fills the other), and everything downstream derives from
    * what was WRITTEN — the touched-bucket sets come off one driver
    * listing per side (the same listing the manifest rows need anyway)
    * and the ΔJ terms read the written files back. The written dirs ARE
    * the frozen snapshot, so the eager per-delta localCheckpoint (a
    * second full materialization of each delta) and the per-side
    * distinct-bucket collect jobs the old shape paid are gone — four
    * actions per refresh instead of eight, and at corpus scale each
    * delta's bytes are materialized once (its commit file), not twice
    * (checkpoint blocks + commit file). */
  private def applyManifest(dA: DataFrame, dB: DataFrame, spark: SparkSession,
                            base: String, key: String, nBuckets: Int,
                            tag: Option[Long],
                            manifest: Array[ManifestRow]): Unit = {
    val next = (manifest.map(_.c) :+ -1L).max + 1
    def deltaDir(side: String) = s"$base/$side/c=$next"
    def writeDelta(side: String, d: DataFrame): Unit =
      // overwrite: a torn previous attempt at this commit id is replaced
      withBucket(d, key, nBuckets)
        .write.mode(SaveMode.Overwrite).partitionBy(BUCKET).parquet(deltaDir(side))
    graft.util.Par.run(() => writeDelta("a", dA), () => writeDelta("b", dB))
    val bkA = writtenBuckets(spark, deltaDir("a"))
    val bkB = writtenBuckets(spark, deltaDir("b"))
    // the just-written commit dirs read back: a stable on-disk snapshot
    // of each delta (`like` supplies the schema when the delta was empty
    // and wrote no bucket directory)
    def readDelta(side: String, bks: Seq[Int], like: => DataFrame): DataFrame =
      if (bks.isEmpty) like.filter(lit(false))
      else spark.read.option("basePath", s"$base/$side")
        .parquet(bks.map(bk => s"${deltaDir(side)}/$BUCKET=$bk"): _*)
        .drop("c", BUCKET)
    val dAr = readDelta("a", bkA, dA)
    val dBr = readDelta("b", bkB, dB)
    // pre-append states by construction: readSideLive resolves the
    // manifest read before any new directory landed, so the commit dirs
    // written above are invisible to these resolutions
    val aAff = readSideLive(spark, base, "a", manifest, Some(bkB.toSet), dA)
    val bAff = readSideLive(spark, base, "b", manifest, Some(bkA.toSet), dB)
    val deltaJ = dAr.join(bAff, key)
      .unionByName(aAff.join(dBr, key))
      .unionByName(dAr.join(dBr, key))
    withBucket(deltaJ, key, nBuckets)
      .write.mode(SaveMode.Overwrite).partitionBy(BUCKET).parquet(deltaDir("j"))
    val rows = Seq(("a", bkA), ("b", bkB),
      ("j", writtenBuckets(spark, deltaDir("j")))).flatMap { case (side, bks) =>
      bks.map(bk => ManifestRow(next, side, bk, tag))
    }
    // an all-empty tagged refresh still records its replay marker
    val withMarker =
      if (rows.nonEmpty || tag.isEmpty) rows
      else Seq(ManifestRow(next, "j", -1, tag))
    // the commit point for all three tables at once
    if (withMarker.nonEmpty)
      writeManifest(spark, base, withMarker, append = true)
  }

  /** The maintained join (all buckets); a live-but-empty view (no key
    * overlap yet) is an empty frame, not an error. */
  def readJoinView(spark: SparkSession, base: String): DataFrame = {
    require(manifestExists(spark, base), s"no join view at $base")
    val manifest = readManifest(spark, base)
    readSideLive(spark, base, "j", manifest, None,
      emptySide(spark, base, "j"))
  }

  /** [[appendToJoinView]] for side A guarded by a batch tag: a tag
    * already in the manifest means the batch committed in a previous
    * incarnation and the call is a no-op (returns false). Because the
    * tag rides the SAME manifest append that publishes the three commit
    * directories, there is no state in which the batch is
    * half-remembered — the torn-apply at-least-once window of a
    * side-car ledger does not exist here. */
  def appendSideATagged(batch: DataFrame, spark: SparkSession, base: String,
                        key: String, nBuckets: Int, tag: Long): Boolean = {
    require(manifestExists(spark, base),
      s"no join view at $base — writeJoinView first")
    val manifest = readManifest(spark, base)
    if (manifest.exists(_.tag.contains(tag))) false
    else {
      // an empty frame with the TRUE b-side schema from the side-car —
      // no listing, valid even before any B data exists (the
      // fact-stream / dimension-loads-later pattern)
      applyManifest(batch, emptySide(spark, base, "b"), spark, base, key,
        nBuckets, Some(tag), manifest)
      true
    }
  }

  /** Continuous maintenance: fold a STREAMING delta of side A into the
    * view per micro-batch (side-B deltas keep arriving through the
    * batch API — the common fact-stream / dimension-batch shape). Each
    * trigger inherits [[appendToJoinView]]'s bucket locality;
    * redelivered batches are exactly-once via the manifest-borne batch
    * tag ([[appendSideATagged]]).
    *
    * `checkpoint` is MANDATORY: batch ids are only monotone across
    * restarts when the engine replays them from a checkpoint. Without
    * one, a restarted query re-numbers from 0, every new batch's tag
    * collides with an old one already in the manifest, and
    * [[appendSideATagged]] silently drops genuinely new data — a
    * checkpoint-less tagged sink is not at-least-once, it is lossy. */
  def joinViewSinkA(deltaA: DataFrame, base: String, key: String,
                    nBuckets: Int = 64,
                    checkpoint: String) =
    deltaA.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          appendSideATagged(batch, batch.sparkSession, base, key,
            nBuckets, batchId): Unit
        }
      }
      .start()

  /** Sweep every data directory the manifest no longer names —
    * deferred compaction GC (`gc = false`) and torn-apply orphans
    * alike; see [[VectorStoreOps.vacuumStore]] for the contract
    * (including the skip of commit dirs numbered past the manifest's
    * max — the slot a concurrent refresh or compaction is writing
    * into before its publish). */
  def vacuumJoinView(spark: SparkSession, base: String): Unit = {
    require(manifestExists(spark, base), s"no join view at $base")
    val manifest = readManifest(spark, base)
    val maxCommitted = (manifest.map(_.c) :+ -1L).max
    val fs = hadoopFs(spark, base)
    Sides.foreach { side =>
      val live = manifest
        .filter(r => r.side == side && r.bucket >= 0)
        .map(r => (r.c, r.bucket)).toSet
      val root = new org.apache.hadoop.fs.Path(s"$base/$side")
      if (fs.exists(root)) {
        fs.listStatus(root)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("c="))
          .filter(_.getPath.getName.stripPrefix("c=").toLong <= maxCommitted)
          .foreach { cDir =>
            val c = cDir.getPath.getName.stripPrefix("c=").toLong
            fs.listStatus(cDir.getPath)
              .filter(st => st.isDirectory &&
                st.getPath.getName.startsWith(s"$BUCKET="))
              .foreach { bDir =>
                val bk = bDir.getPath.getName.stripPrefix(s"$BUCKET=").toInt
                if (!live((c, bk))) fs.delete(bDir.getPath, true)
              }
            if (!fs.listStatus(cDir.getPath).exists(st =>
                st.isDirectory && st.getPath.getName.startsWith(s"$BUCKET=")))
              fs.delete(cDir.getPath, true)
          }
      }
    }
    spark.catalog.refreshByPath(base)
  }

  /** Small-files maintenance: every refresh appends one file per
    * touched bucket per side, so long-lived views accumulate files
    * linearly in refresh count. Rewrite each bucket of the three tables
    * that holds more than `maxFilesPerBucket` LIVE files into a new
    * commit of its side — bucket layout (and therefore refresh
    * locality) preserved, data unchanged (spec-asserted); the manifest
    * swap retains ingest tags whose data rows are superseded as
    * `bucket = -1` markers. Buckets under the threshold keep their
    * files byte-untouched. File counting is ONE recursive listing per
    * side, never a per-directory listStatus loop. (Keep the
    * manifest-swap/marker/GC shape in sync with
    * [[VectorStoreOps]].rewriteCells, the other manifest-committed
    * store.) */
  def compactJoinView(spark: SparkSession, base: String,
                      maxFilesPerBucket: Int = 4,
                      gc: Boolean = true): Unit = {
    require(manifestExists(spark, base), s"no join view at $base")
    // ONE manifest read and ONE swap for all three sides: their manifest
    // rows are disjoint (the side column), so the per-side rewrites can
    // all land first — under one shared commit id, in per-side dirs —
    // and a single swap publishes everything. The per-side
    // read/swap/read/swap round-trip this replaces paid two extra
    // manifest resolutions and two extra versioned swaps per compaction
    // for no added safety: a crash before the one swap leaves the prior
    // manifest live and the orphan c=<next> dirs are the same in-flight
    // slot a torn refresh leaves (vacuum skips them; the next writer
    // overwrites them).
    val manifest = readManifest(spark, base)
    val fs = hadoopFs(spark, base)
    val next = manifest.map(_.c).max + 1
    var kept = manifest.toIndexedSeq
    var newRows = IndexedSeq.empty[ManifestRow]
    var droppedAll = IndexedSeq.empty[ManifestRow]
    Sides.foreach { side =>
      val live = manifest
        .filter(r => r.side == side && r.bucket >= 0)
        .map(r => (r.c, r.bucket)).toSet
      val counts = scala.collection.mutable.Map.empty[Int, Int]
      val root = new org.apache.hadoop.fs.Path(s"$base/$side")
      if (fs.exists(root)) {
        val it = fs.listFiles(root, true)
        while (it.hasNext) {
          val f = it.next().getPath
          if (f.getName.endsWith(".parquet")) {
            val bDir = f.getParent
            val cDir = bDir.getParent
            if (bDir.getName.startsWith(s"$BUCKET=") &&
                cDir.getName.startsWith("c=")) {
              val bk = bDir.getName.stripPrefix(s"$BUCKET=").toInt
              val c = cDir.getName.stripPrefix("c=").toLong
              if (live((c, bk)))
                counts.update(bk, counts.getOrElse(bk, 0) + 1)
            }
          }
        }
      }
      val frag = counts.filter(_._2 > maxFilesPerBucket).keySet.toSet
      if (frag.nonEmpty) {
        val dirs = manifest
          .filter(r => r.side == side && frag(r.bucket))
          .map(r => s"$base/$side/c=${r.c}/$BUCKET=${r.bucket}")
        val commitDir = s"$base/$side/c=$next"
        spark.read.option("basePath", s"$base/$side")
          .parquet(dirs.toIndexedSeq: _*)
          .drop("c")
          .withColumn(BUCKET, col(BUCKET).cast("int"))
          .repartition(frag.size, col(BUCKET))
          .write.mode(SaveMode.Overwrite).partitionBy(BUCKET).parquet(commitDir)
        val surviving = writtenBuckets(spark, commitDir)
        val (dropped, keptRest) = kept
          .partition(r => r.side == side && r.bucket >= 0 && frag(r.bucket))
        kept = keptRest
        newRows ++= surviving.map(bk => ManifestRow(next, side, bk, None))
        droppedAll ++= dropped
      }
    }
    if (droppedAll.nonEmpty) {
      // tags whose every data row was superseded survive as pure
      // markers — the replay guard must outlive the data it guarded
      val markers = droppedAll.flatMap(_.tag).distinct
        .filterNot(t => kept.exists(_.tag.contains(t)))
        .map(t => ManifestRow(next, "j", -1, Some(t)))
      writeManifest(spark, base, kept ++ markers ++ newRows, append = false)
      // post-commit GC; orphans from a crash here are invisible.
      // `gc = false` defers deletion so in-flight readers resolved
      // against the old manifest keep their files (sweep later)
      if (gc) droppedAll.foreach { r =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$base/${r.side}/c=${r.c}/$BUCKET=${r.bucket}"), true)
        val cdir = new org.apache.hadoop.fs.Path(s"$base/${r.side}/c=${r.c}")
        if (fs.exists(cdir) && !fs.listStatus(cdir).exists(st =>
            st.isDirectory && st.getPath.getName.startsWith(s"$BUCKET=")))
          fs.delete(cdir, true)
      }
    }
  }
}
