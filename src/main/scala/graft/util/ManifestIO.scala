package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned manifest commits — THE durability seam shared by the two
  * manifest-committed stores ([[graft.ops.VectorStoreOps]] and
  * [[graft.ops.IncrementalJoinOps]]), factored here so their swap
  * semantics cannot drift apart.
  *
  * The manifest names a store's live data directories; it is the single
  * commit point for every mutation, so ITS rewrite must never have a
  * window in which no committed manifest exists. A flat
  * `SaveMode.Overwrite` rewrite has exactly that window: Spark deletes
  * the old directory before the new job commits, and a crash inside it
  * leaves the store's (intact) data unreachable until manual surgery.
  *
  * Layout: `<dir>/v=N/` parquet snapshots. A version is COMMITTED iff
  * its `_SUCCESS` marker exists — written by the Hadoop committer at
  * job commit, strictly after every data file is in place. The three
  * operations:
  *
  *  - READ resolves the highest committed version (and only ever that —
  *    a half-written `v=N` with no `_SUCCESS` is invisible);
  *  - APPEND adds files INSIDE the live version's directory
  *    (`SaveMode.Append` stages under `_temporary` and renames in at
  *    job commit — no existing file is touched, so a torn append leaves
  *    the version exactly as it was);
  *  - SWAP (full rewrite: delete / compaction) writes `v=max+1` BESIDE
  *    the live version and retires older versions only after the new
  *    `_SUCCESS` lands. A crash before the marker leaves the old
  *    version live (the next swap overwrites the torn directory); a
  *    crash after it, mid-retire, leaves extra committed versions that
  *    readers ignore (max wins) and the next swap sweeps.
  *
  * Single writer at a time, as both stores document; readers collect
  * the manifest eagerly at resolution time, so retiring the prior
  * version immediately after a swap does not race them.
  */
object ManifestIO {

  private val Success = "_SUCCESS"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every `v=N` child of `dir`, committed or torn. */
  private def allVersions(spark: SparkSession, dir: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val fs = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(st => (st.getPath.getName.stripPrefix("v=").toLong, st.getPath))
  }

  private def committedVersions(spark: SparkSession, dir: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val fs = fsOf(spark, dir)
    allVersions(spark, dir).filter { case (_, p) =>
      fs.exists(new org.apache.hadoop.fs.Path(p, Success))
    }
  }

  /** A store EXISTS iff some committed manifest version does. Only a
    * fully absent manifest means fresh — a transient filesystem failure
    * must propagate, or an append would treat a live store as empty. */
  def exists(spark: SparkSession, dir: String): Boolean =
    committedVersions(spark, dir).nonEmpty

  /** The current committed manifest (highest committed version). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val vs = committedVersions(spark, dir)
    require(vs.nonEmpty, s"no committed manifest under $dir")
    spark.read.parquet(vs.maxBy(_._1)._2.toString)
  }

  /** All committed manifest versions, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] =
    committedVersions(spark, dir).map(_._1).sorted

  /** Highest committed manifest version — the handle to remember
    * before a mutation for a later [[readAt]]. */
  def maxVersion(spark: SparkSession, dir: String): Long = {
    val vs = committedVersions(spark, dir)
    require(vs.nonEmpty, s"no committed manifest under $dir")
    vs.map(_._1).max
  }

  /** TIME TRAVEL: the manifest exactly as committed at version `v`.
    * Fails loudly when `v` was retired (a swap without
    * `retainHistory`, or a vacuum past its floor) — a reclaimed
    * snapshot is detected, never silently substituted. */
  def readAt(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val vs = committedVersions(spark, dir)
    require(vs.nonEmpty, s"no committed manifest under $dir")
    vs.find(_._1 == v) match {
      case Some((_, p)) => spark.read.parquet(p.toString)
      case None => throw new IllegalArgumentException(
        s"manifest version $v of $dir predates the retention " +
          s"(committed versions: ${vs.map(_._1).sorted.mkString(", ")}) — " +
          "mutate with retainHistory/gc=false and vacuum with a " +
          "retention floor to keep older reads alive")
    }
  }

  /** Append `rows` into the live version — the cheap path an ingest
    * takes: one new file lands via stage-and-rename, nothing existing
    * is touched, and the rename IS the commit point. */
  def append(spark: SparkSession, dir: String, rows: DataFrame): Unit = {
    val vs = committedVersions(spark, dir)
    require(vs.nonEmpty, s"no committed manifest under $dir to append to")
    val target = vs.maxBy(_._1)._2.toString
    rows.coalesce(1).write.mode(SaveMode.Append).parquet(target)
    spark.catalog.refreshByPath(dir)
  }

  /** Replace the manifest with `rows`: write `v=max+1` beside the live
    * version (overwriting any torn prior attempt at that id), then
    * retire every other version — or, with `retainHistory`, keep the
    * prior COMMITTED versions as time-travel snapshots ([[readAt]];
    * torn versions are still swept). Valid on a fresh `dir` too
    * (initial build writes `v=0`). */
  def swap(spark: SparkSession, dir: String, rows: DataFrame,
           retainHistory: Boolean = false): Unit = {
    val before = allVersions(spark, dir)
    val committedBefore = committedVersions(spark, dir).map(_._1).toSet
    val next = (before.map(_._1) :+ -1L).max + 1
    rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/v=$next")
    // VERIFY v=next is actually committed before retiring anything: if
    // the success marker is disabled (marksuccessfuljobs=false) or its
    // write failed, deleting the old versions would destroy the only
    // committed manifests — the exact window this class exists to close.
    val fs = fsOf(spark, dir)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=$next", Success)),
      s"manifest swap aborted: $dir/v=$next has no $Success marker " +
        "(committer success-marker disabled or failed); prior versions left live")
    before.foreach { case (v, p) =>
      if (!(retainHistory && committedBefore(v))) fs.delete(p, true)
    }
    spark.catalog.refreshByPath(dir)
  }

  /** Retire committed manifest versions below the retention floor
    * (keep the newest `retainVersions + 1`) — the [[readAt]] horizon
    * management, matching the agg store's vacuum semantics. */
  def vacuumVersions(spark: SparkSession, dir: String,
                     retainVersions: Int): Unit = {
    val vs = committedVersions(spark, dir)
    if (vs.nonEmpty) {
      val horizon = vs.map(_._1).max - math.max(0, retainVersions)
      val fs = fsOf(spark, dir)
      vs.filter(_._1 < horizon).foreach { case (_, p) => fs.delete(p, true) }
      spark.catalog.refreshByPath(dir)
    }
  }
}
