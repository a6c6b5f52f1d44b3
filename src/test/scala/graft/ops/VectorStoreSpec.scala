package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[VectorStoreOps]] — the gate hash-compares ann_inc_q end-to-end
  * through a real store; this spec pins what the oracle can't see:
  * exact search-equivalence with the batch IVF operator, the dynamic
  * partition pruning that makes the store the scale path (a probe reads
  * only its cells' directories), and same-session append visibility. */
class VectorStoreSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.queries.t(spark, sfSmall, "embeddings")

  test("store+append search equals the batch IVF operator row-for-row") {
    val store = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val base = Files.createTempDirectory("vstore-eq").toString
    val cents = SimilarityOps.ivfCentroids(store, nlist = 8, iters = 1)

    VectorStoreOps.writeVectorStore(store, spark, base, cents)
    VectorStoreOps.appendToVectorStore(delta, spark, base)
    val fromStore = VectorStoreOps
      .searchStore(queries, spark, base, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = SimilarityOps
      .ivfTopKWithCentroids(queries, emb, cents, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3)))
      .toSet
    assert(fromStore == batch,
      "the persisted store must answer exactly like the in-memory operator")
    assert(fromStore.nonEmpty)
  }

  test("probed cells reach the scan as a dynamic partition-pruning filter") {
    val base = Files.createTempDirectory("vstore-dpp").toString
    val cents = SimilarityOps.ivfCentroids(emb, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(emb, spark, base, cents)
    val df = VectorStoreOps.searchStore(
      emb.filter(col("vec_id") % 50 === 0), spark, base, k = 5, nprobe = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"store scan must carry a dynamic partition-pruning filter:\n$plan")
  }

  test("delete rewrites only affected cells; emptied cells disappear") {
    val base = Files.createTempDirectory("vstore-del").toString
    val cents = SimilarityOps.ivfCentroids(emb, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(emb, spark, base, cents)
    val items = spark.read.parquet(s"$base/items")
      .select(col("item_id"), col("cid").cast("long").as("cid"))
    val byCell = items.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    // delete one whole cell plus two vectors from another
    val (wholeCell, partialCell) = {
      val cs = byCell.keys.toSeq.sorted; (cs.head, cs.last)
    }
    val delIds = byCell(wholeCell) ++ byCell(partialCell).take(2)
    val untouchedCells = byCell.keys.toSet - wholeCell - partialCell
    def cellFiles(cid: Long) = {
      val d = new java.io.File(s"$base/items/cid=$cid")
      if (!d.exists()) Map.empty[String, Long]
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = untouchedCells.map(c => c -> cellFiles(c)).toMap
    VectorStoreOps.deleteFromVectorStore(
      delIds.toSeq.toDF("vec_id"), spark, base)
    untouchedCells.foreach { c =>
      assert(cellFiles(c) == before(c), s"cell $c files must be untouched")
    }
    assert(!new java.io.File(s"$base/items/cid=$wholeCell").exists(),
      "a fully-deleted cell's directory must be removed")
    val after = spark.read.parquet(s"$base/items")
      .select("item_id").collect().map(_.getLong(0)).toSet
    assert(after == byCell.values.flatten.toSet -- delIds,
      "exactly the deleted ids must be gone")
    // and search still answers like a freshly-built store on the remnant
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val remnant = emb.join(delIds.toSeq.toDF("vec_id"), Seq("vec_id"),
      "left_anti")
    val base2 = Files.createTempDirectory("vstore-del2").toString
    VectorStoreOps.writeVectorStore(remnant, spark, base2, cents)
    val a = VectorStoreOps.searchStore(queries, spark, base, 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = VectorStoreOps.searchStore(queries, spark, base2, 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "post-delete search must equal a rebuild on the remnant")
  }

  test("compaction rewrites only oversized cells and preserves the data") {
    val base = Files.createTempDirectory("vstore-compact").toString
    val cents = SimilarityOps.ivfCentroids(emb, nlist = 8, iters = 1)
    // initial store + 5 appends → up to 6 files per cell
    VectorStoreOps.writeVectorStore(
      emb.filter(col("vec_id") % 6 === 0), spark, base, cents)
    (1 to 5).foreach { m =>
      VectorStoreOps.appendToVectorStore(
        emb.filter(col("vec_id") % 6 === m), spark, base)
    }
    def files(cid: Long) = {
      val d = new java.io.File(s"$base/items/cid=$cid")
      if (!d.exists()) Array.empty[java.io.File]
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
    }
    val cells = new java.io.File(s"$base/items").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName.stripPrefix("cid=").toLong)
    assert(cells.exists(files(_).length > 4), "appends must fragment cells")
    val before = spark.read.parquet(s"$base/items")
      .select("item_id").collect().map(_.getLong(0)).toSet
    VectorStoreOps.compactVectorStore(spark, base, maxFilesPerCell = 4)
    cells.foreach { c =>
      assert(files(c).length <= 4, s"cell $c still has ${files(c).length} files")
    }
    val after = spark.read.parquet(s"$base/items")
      .select("item_id").collect().map(_.getLong(0)).toSet
    assert(after == before, "compaction must not change the data")
  }

  test("append is visible to a reader opened in the same session") {
    val base = Files.createTempDirectory("vstore-vis").toString
    val store = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val cents = SimilarityOps.ivfCentroids(store, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(store, spark, base, cents)
    // force a file-listing cache entry for the items path BEFORE the
    // append — the refreshByPath in appendToVectorStore must invalidate
    // it or the delta silently never joins
    val before = spark.read.parquet(s"$base/items").count()
    VectorStoreOps.appendToVectorStore(delta, spark, base)
    val after = spark.read.parquet(s"$base/items").count()
    assert(before == store.count() && after == emb.count(),
      s"append must land and be visible: $before -> $after")
    // and the delta ids must be searchable
    val hits = VectorStoreOps
      .searchStore(queries, spark, base, k = 10, nprobe = 8)
      .filter(col("item_id") % 5 === 0).count()
    assert(hits > 0, "appended vectors must be reachable by search")
  }
}
