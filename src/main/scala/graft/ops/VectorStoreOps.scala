package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A persistent, incrementally-ingestable IVF vector store.
  *
  * [[SimilarityOps.ivfTopKWithCentroids]] re-assigns the whole corpus to
  * cells on every search — right for one-shot queries, waste for a
  * serving corpus that only ever GROWS. This operator persists the
  * assignment: the corpus is written once as a parquet table
  * PARTITIONED BY the cell id, new batches are assigned against the
  * frozen centroid table and appended into the same cell directories,
  * and a search reads the store back with the probed cells pushed into
  * the scan as a dynamic partition-pruning filter — at nlist=1024 /
  * nprobe=32 a query batch physically reads ~3% of a 100 TB store, and
  * an ingest touches only the delta (the store is never re-assigned,
  * never re-shuffled; each append adds files under its cells'
  * directories).
  *
  * Layout choice: DIRECTORY partitioning (not bucketing) because the
  * probe predicate is a small IN-list over cell ids — exactly what
  * partition pruning eliminates at file-listing time; bucketing would
  * only co-locate a shuffle that the broadcast probe join doesn't need.
  */
object VectorStoreOps {

  /** Per-row best cell of `df`'s vectors against the (broadcast)
    * centroid table, ties to the lowest cid. `probeRound` optionally
    * rounds the cosine before ranking — the oracle twin passes a digit
    * count so an independent engine reproduces the cell choice exactly;
    * production leaves it None (full precision). */
  private def bestCells(spark: SparkSession, vecs: DataFrame,
                        cents: DataFrame, top: Int,
                        probeRound: Option[Int]): DataFrame = {
    val raw = SimilarityOps.cosineFast(spark, col("__v"), col("cvec"))
    val s = probeRound.fold(raw)(d => round(raw, d))
    vecs.crossJoin(broadcast(cents))
      .withColumn("__s", s)
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__id").orderBy(desc("__s"), col("cid"))))
      .filter(col("__rk") <= top)
      .select(col("__id"), col("__v"), col("cid"))
  }

  /** Corpus/delta → cell assignment. Unlike [[bestCells]] (top-n for the
    * QUERY side's probes, a small frame), this is the whole-corpus path of
    * a store build — top-1 expressed as `max_by` so it runs as a hash
    * aggregate with MAP-SIDE partials over the crossJoin output instead of
    * a full-corpus sort-window keyed on the (unique) vector id. Tie rule
    * identical to bestCells: highest score, then lowest cid
    * (lexicographic max of (score, -cid)). `first(__v)` is deterministic
    * here — every row of a group carries the same vector. */
  private def assigned(spark: SparkSession, df: DataFrame, cents: DataFrame,
                       idCol: String, vecCol: String,
                       probeRound: Option[Int]): DataFrame = {
    val raw = SimilarityOps.cosineFast(spark, col("__v"), col("cvec"))
    val s = probeRound.fold(raw)(d => round(raw, d))
    df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("__s", s)
      .groupBy("__id")
      .agg(first(col("__v")).as("cv"),
        max_by(col("cid"), struct(col("__s"), -col("cid"))).as("cid"))
      .select(col("__id").as("item_id"), col("cv"), col("cid"))
  }

  /** Create the store at `basePath`: the frozen centroid table (tiny,
    * one file) plus the corpus assigned to cells, partitioned by cid. */
  def writeVectorStore(corpus: DataFrame, spark: SparkSession,
                       basePath: String, cents: DataFrame,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       assignRound: Option[Int] = None): Unit = {
    cents.coalesce(1).write.mode("overwrite").parquet(s"$basePath/centroids")
    assigned(spark, corpus, cents, idCol, vecCol, assignRound)
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$basePath/items")
  }

  /** Ingest a batch: assign against the FROZEN centroids, append under
    * the matching cell directories. The store itself is untouched —
    * ingest cost is one pass over the delta. The refresh drops Spark's
    * cached file listing for the path, so a reader in this session sees
    * the appended cells immediately. */
  def appendToVectorStore(delta: DataFrame, spark: SparkSession,
                          basePath: String,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          assignRound: Option[Int] = None): Unit = {
    val cents = spark.read.parquet(s"$basePath/centroids")
    assigned(spark, delta, cents, idCol, vecCol, assignRound)
      .write.mode("append").partitionBy("cid")
      .parquet(s"$basePath/items")
    spark.catalog.refreshByPath(s"$basePath/items")
  }

  /** Compact cells whose file count exceeded `maxFilesPerCell` —
    * repeated appends leave one file per (append, cell), and at some
    * point the scan's open-file overhead beats the append savings. Only
    * oversized cells are rewritten (the usual locality contract); data
    * is unchanged (spec-pinned). */
  def compactVectorStore(spark: SparkSession, basePath: String,
                         maxFilesPerCell: Int = 4): Unit = {
    val itemsPath = s"$basePath/items"
    val root = new org.apache.hadoop.fs.Path(itemsPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oversized = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cid="))
      .filter(st => fs.listStatus(st.getPath)
        .count(f => f.getPath.getName.endsWith(".parquet")) > maxFilesPerCell)
      .map(_.getPath.getName.stripPrefix("cid=").toLong)
    if (oversized.nonEmpty) {
      val items = spark.read.parquet(itemsPath)
        .select(col("item_id"), col("cv"), col("cid").cast("long").as("cid"))
      val rewritten = items
        .filter(col("cid").isin(oversized.toIndexedSeq: _*))
        .repartition(col("cid"))
        .localCheckpoint(true) // freeze before overwriting what it reads
      rewritten.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cid").parquet(itemsPath)
      spark.catalog.refreshByPath(itemsPath)
    }
  }

  /** Delete vectors by id — the right-to-be-forgotten path, with the
    * same locality contract as every other store mutation: only the
    * cells that actually hold a deleted id are rewritten (dynamic
    * partition overwrite); untouched cells stay byte-for-byte. A cell
    * whose every vector is deleted needs special care: dynamic
    * overwrite only replaces partitions it WRITES, so an
    * emptied-to-zero cell would silently keep its stale files — those
    * directories are removed explicitly. */
  def deleteFromVectorStore(ids: DataFrame, spark: SparkSession,
                            basePath: String,
                            idCol: String = "vec_id"): Unit = {
    val itemsPath = s"$basePath/items"
    val del = ids.select(col(idCol).cast("long").as("item_id"))
      .distinct().localCheckpoint(true)
    val items = spark.read.parquet(itemsPath)
      .select(col("item_id"), col("cv"), col("cid").cast("long").as("cid"))
    val touched = items.join(del, "item_id")
      .select("cid").distinct().collect().map(_.getLong(0))
    if (touched.nonEmpty) {
      val remaining = items
        .filter(col("cid").isin(touched.toIndexedSeq: _*))
        .join(del, Seq("item_id"), "left_anti")
        .localCheckpoint(true) // freeze before overwriting what it reads
      remaining.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cid").parquet(itemsPath)
      // cells deleted down to zero rows never got re-written — drop them
      val stillThere = remaining.select("cid").distinct()
        .collect().map(_.getLong(0)).toSet
      val fs = new org.apache.hadoop.fs.Path(itemsPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (touched.toSet -- stillThere).foreach { cid =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$itemsPath/cid=$cid"), true)
      }
      spark.catalog.refreshByPath(itemsPath)
    }
  }

  /** IVF top-k against the store: probe `nprobe` cells per query, exact
    * cosine re-rank inside them. Same output contract (and, under the
    * same centroids, the same rows — spec-pinned) as
    * [[SimilarityOps.ivfTopKWithCentroids]], but the corpus side is the
    * persisted table: the broadcast probe join carries the probed cell
    * ids into the scan as a dynamic partition-pruning filter, so only
    * those cell directories are read. */
  def searchStore(queries: DataFrame, spark: SparkSession, basePath: String,
                  k: Int, nprobe: Int = 4,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  probeRound: Option[Int] = None): DataFrame = {
    val cents = spark.read.parquet(s"$basePath/centroids")
    val items = spark.read.parquet(s"$basePath/items")
      .select(col("item_id"), col("cv"), col("cid").cast("long").as("cid"))
    val probes = bestCells(spark,
      queries.select(col(idCol).as("__id"), col(vecCol).as("__v")),
      cents, top = nprobe, probeRound)
      .select(col("__id").as("query_id"), col("__v").as("qv"), col("cid"))
    val cand = items.join(broadcast(probes), "cid")
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("cos",
        round(SimilarityOps.cosineFast(spark, col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("item_id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "cos")
  }

  /** FILTERED vector search — top-k among only the items whose metadata
    * satisfies `pred` (PRE-FILTER semantics: ranks are assigned after
    * filtering, so every query still gets k eligible results when k
    * eligible candidates exist in its probed cells — a post-filtered
    * top-k would silently return fewer). `meta` maps item id →
    * attribute columns; the eligible-id set is semi-joined into the
    * probed candidates before the re-rank, so at scale it is the
    * filtered (small) side that moves, never the store. Same output
    * contract as [[searchStore]]. */
  def searchStoreFiltered(queries: DataFrame, spark: SparkSession,
                          basePath: String, k: Int, meta: DataFrame,
                          pred: org.apache.spark.sql.Column,
                          nprobe: Int = 4,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          probeRound: Option[Int] = None): DataFrame = {
    val cents = spark.read.parquet(s"$basePath/centroids")
    val items = spark.read.parquet(s"$basePath/items")
      .select(col("item_id"), col("cv"), col("cid").cast("long").as("cid"))
    val eligible = meta.filter(pred)
      .select(col(idCol).as("item_id")).distinct()
    val probes = bestCells(spark,
      queries.select(col(idCol).as("__id"), col(vecCol).as("__v")),
      cents, top = nprobe, probeRound)
      .select(col("__id").as("query_id"), col("__v").as("qv"), col("cid"))
    val cand = items.join(broadcast(probes), "cid")
      .join(eligible, Seq("item_id"), "left_semi")
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("cos",
        round(SimilarityOps.cosineFast(spark, col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("item_id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "cos")
  }
}
