package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[VectorStoreOps]] — the gate hash-compares ann_inc_q end-to-end
  * through a real store; this spec pins what the oracle can't see:
  * exact search-equivalence with the batch IVF operator, the dynamic
  * partition pruning that makes the store the scale path (a probe reads
  * only its cells' directories), same-session append visibility, and
  * the manifest-commit durability contract (a torn append is invisible;
  * a retry overwrites it). */
class VectorStoreSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.queries.t(spark, sfSmall, "embeddings")

  /** A cell's live parquet files across ALL commit directories, keyed
    * `c=N/part-...` so cross-commit moves are visible. */
  private def cellFiles(base: String, cid: Long): Map[String, Long] = {
    val items = new java.io.File(s"$base/items")
    if (!items.exists()) Map.empty
    else items.listFiles().toSeq
      .filter(d => d.isDirectory && d.getName.startsWith("c="))
      .flatMap { c =>
        val d = new java.io.File(c, s"cid=$cid")
        if (!d.exists()) Seq.empty
        else d.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
          .map(f => s"${c.getName}/${f.getName}" -> f.lastModified())
      }.toMap
  }

  private def allCells(base: String): Set[Long] = {
    val items = new java.io.File(s"$base/items")
    if (!items.exists()) Set.empty
    else items.listFiles().toSet
      .filter(d => d.isDirectory && d.getName.startsWith("c="))
      .flatMap((c: java.io.File) => c.listFiles().toSet
        .filter(d => d.isDirectory && d.getName.startsWith("cid="))
        .map(_.getName.stripPrefix("cid=").toLong))
  }

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

  test("a torn append (data files written, manifest not) is invisible; " +
    "the retry overwrites it") {
    val base = Files.createTempDirectory("vstore-torn").toString
    val store = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val cents = SimilarityOps.ivfCentroids(store, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(store, spark, base, cents)
    val committedCount = VectorStoreOps.readStore(spark, base).count()
    def search() = VectorStoreOps
      .searchStore(queries, spark, base, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val committedSearch = search()

    // simulate the torn append: the delta's data files land under the
    // NEXT commit directory (with deliberately WRONG content — every row
    // in one cell — so inclusion would be visible), but the job dies
    // before the manifest row is written
    val someCell = allCells(base).min
    delta.select(col("vec_id").as("item_id"),
        col("embedding").as("cv"), lit(someCell).as("cid"))
      .write.partitionBy("cid").parquet(s"$base/items/c=1")
    assert(VectorStoreOps.readStore(spark, base).count() == committedCount,
      "uncommitted files must be invisible to reads")
    assert(search() == committedSearch,
      "uncommitted files must be invisible to search")

    // the RETRY lands on the same commit id, overwrites the torn
    // directory (correctly assigned this time), and publishes it
    VectorStoreOps.appendToVectorStore(delta, spark, base)
    val after = VectorStoreOps.readStore(spark, base)
    assert(after.count() == emb.count(),
      "the retried append must land exactly once")
    assert(after.groupBy("item_id").count().filter(col("count") > 1).count() == 0,
      "no item may appear twice after the retry")
    // and the store now answers like the batch operator on the full corpus
    val batch = SimilarityOps
      .ivfTopKWithCentroids(queries, emb, cents, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(search() == batch)
  }

  test("tagged appends are idempotent, and the replay guard survives " +
    "compaction of the batch it guards") {
    val base = Files.createTempDirectory("vstore-tag").toString
    val store = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val cents = SimilarityOps.ivfCentroids(store, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(store, spark, base, cents)
    val n0 = VectorStoreOps.readStore(spark, base).count()

    assert(VectorStoreOps.appendTagged(delta, spark, base, Some(7L),
      "vec_id", "embedding", None), "first delivery must commit")
    val n1 = VectorStoreOps.readStore(spark, base).count()
    assert(n1 == n0 + delta.count())
    assert(!VectorStoreOps.appendTagged(delta, spark, base, Some(7L),
      "vec_id", "embedding", None), "replay of a committed tag must skip")
    assert(VectorStoreOps.readStore(spark, base).count() == n1,
      "a replayed batch must not land twice")

    // compaction rewrites the batch's directories away — the tag must
    // survive as a marker, or a late replay would re-ingest
    VectorStoreOps.compactVectorStore(spark, base, maxFilesPerCell = 1)
    assert(VectorStoreOps.readStore(spark, base).count() == n1)
    assert(!VectorStoreOps.appendTagged(delta, spark, base, Some(7L),
      "vec_id", "embedding", None),
      "the replay guard must survive compaction")
    assert(VectorStoreOps.readStore(spark, base).count() == n1)
    // a genuinely new tag still commits
    val delta2 = emb.filter(col("vec_id") % 50 === 7)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    assert(VectorStoreOps.appendTagged(delta2, spark, base, Some(8L),
      "vec_id", "embedding", None))
    assert(VectorStoreOps.readStore(spark, base).count() ==
      n1 + delta2.count())
  }

  test("streaming ingest lands every vector exactly once across a " +
    "checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("vstore-stream").toString
    val ckpt = s"$base/ckpt"
    val store = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val cents = SimilarityOps.ivfCentroids(store, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(store, spark, base, cents)

    val rows = delta.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (a, b) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, Array[Float])]
    def start() = VectorStoreOps.ingestStream(
      input.toDS().toDF("vec_id", "embedding"), spark, base, ckpt)
    val q1 = start()
    try { input.addData(a.toIndexedSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { input.addData(b.toIndexedSeq); q2.processAllAvailable() }
    finally q2.stop()

    val after = VectorStoreOps.readStore(spark, base)
    assert(after.count() == emb.count(),
      "every streamed vector must land exactly once")
    assert(after.groupBy("item_id").count()
      .filter(col("count") > 1).count() == 0, "no duplicates")
    // and the streamed store answers exactly like the batch operator
    val fromStore = VectorStoreOps
      .searchStore(queries, spark, base, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SimilarityOps
      .ivfTopKWithCentroids(queries, emb, cents, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .toSet
    assert(fromStore == batch)
  }

  test("delete rewrites only affected cells; emptied cells disappear") {
    val base = Files.createTempDirectory("vstore-del").toString
    val cents = SimilarityOps.ivfCentroids(emb, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(emb, spark, base, cents)
    val byCell = VectorStoreOps.readStore(spark, base)
      .select("item_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    // delete one whole cell plus two vectors from another
    val (wholeCell, partialCell) = {
      val cs = byCell.keys.toSeq.sorted; (cs.head, cs.last)
    }
    val delIds = byCell(wholeCell) ++ byCell(partialCell).take(2)
    val untouchedCells = byCell.keys.toSet - wholeCell - partialCell
    val before = untouchedCells.map(c => c -> cellFiles(base, c)).toMap
    VectorStoreOps.deleteFromVectorStore(
      delIds.toSeq.toDF("vec_id"), spark, base)
    untouchedCells.foreach { c =>
      assert(cellFiles(base, c) == before(c), s"cell $c files must be untouched")
    }
    assert(!allCells(base).contains(wholeCell),
      "a fully-deleted cell's directories must be removed")
    val after = VectorStoreOps.readStore(spark, base)
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
    val cells = allCells(base)
    assert(cells.exists(cellFiles(base, _).size > 4),
      "appends must fragment cells")
    val before = VectorStoreOps.readStore(spark, base)
      .select("item_id").collect().map(_.getLong(0)).toSet
    VectorStoreOps.compactVectorStore(spark, base, maxFilesPerCell = 4)
    cells.foreach { c =>
      assert(cellFiles(base, c).size <= 4,
        s"cell $c still has ${cellFiles(base, c).size} files")
    }
    val after = VectorStoreOps.readStore(spark, base)
      .select("item_id").collect().map(_.getLong(0)).toSet
    assert(after == before, "compaction must not change the data")
  }

  test("int8 storage tier: physically quantized, appends and rewrites " +
    "inherit it, search contract preserved") {
    val base = Files.createTempDirectory("vstore-q8").toString
    val baseF = Files.createTempDirectory("vstore-f32").toString
    val store = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val cents = SimilarityOps.ivfCentroids(store, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(store, spark, base, cents,
      quantize = true)
    VectorStoreOps.writeVectorStore(store, spark, baseF, cents)

    def physicalSchema(b: String) = {
      val c0 = new java.io.File(s"$b/items").listFiles()
        .filter(_.getName.startsWith("c=")).head
      val cell = c0.listFiles().filter(_.getName.startsWith("cid=")).head
      spark.read.parquet(cell.toString).schema.fieldNames.toSet
    }
    assert(physicalSchema(base) == Set("item_id", "cv_q", "cv_scale"),
      s"quantized store must persist int8+scale: ${physicalSchema(base)}")
    // 4x smaller on disk (vector payload dominates)
    def bytes(b: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(s"$b/items"))
    }
    assert(bytes(base) < bytes(baseF) / 2,
      s"int8 store not smaller: ${bytes(base)} vs ${bytes(baseF)}")

    // appends inherit the tier without being told
    VectorStoreOps.appendToVectorStore(delta, spark, base)
    VectorStoreOps.appendToVectorStore(delta, spark, baseF)
    assert(VectorStoreOps.readStore(spark, base).count() == emb.count())

    // the reader view restores floats; top-10 search overlaps ≥ 0.9
    // with the float store (ann_quant's quality bar holds through the
    // store path)
    def topk(b: String) = VectorStoreOps
      .searchStore(queries, spark, b, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val qk = topk(base); val fk = topk(baseF)
    assert(qk.keySet == fk.keySet && qk.nonEmpty)
    val overlap = qk.keys.toSeq.map(k =>
      (qk(k) & fk(k)).size.toDouble / fk(k).size).sum / qk.size
    assert(overlap >= 0.9, s"quantized search overlap too low: $overlap")

    // delete + compaction keep the physical tier (no silent de-quantize)
    VectorStoreOps.deleteFromVectorStore(
      queries.select("vec_id").limit(3), spark, base)
    VectorStoreOps.compactVectorStore(spark, base, maxFilesPerCell = 1)
    assert(physicalSchema(base) == Set("item_id", "cv_q", "cv_scale"),
      "maintenance rewrites must preserve the int8 tier")
    assert(VectorStoreOps.readStore(spark, base).count() == emb.count() - 3)
  }

  test("pq storage tier: m-code rows, appends and rewrites inherit it, " +
    "search tracks the decoded-corpus twin") {
    val base = Files.createTempDirectory("vstore-pq").toString
    val baseF = Files.createTempDirectory("vstore-pq-f32").toString
    val store = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val cents = SimilarityOps.ivfCentroids(store, nlist = 8, iters = 1)
    val cb = SimilarityOps.pqCodebooksTrained(store, dim = 64, iters = 1)
    VectorStoreOps.writeVectorStore(store, spark, base, cents,
      pqCodebook = Some(cb))
    VectorStoreOps.writeVectorStore(store, spark, baseF, cents)

    def physicalSchema(b: String) = {
      val c0 = new java.io.File(s"$b/items").listFiles()
        .filter(_.getName.startsWith("c=")).head
      val cell = c0.listFiles().filter(_.getName.startsWith("cid=")).head
      spark.read.parquet(cell.toString).schema.fieldNames.toSet
    }
    assert(physicalSchema(base) == Set("item_id", "codes"),
      s"pq store must persist codes only: ${physicalSchema(base)}")
    def bytes(b: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(s"$b/items"))
    }
    assert(bytes(base) < bytes(baseF) / 4,
      s"pq store not clearly smaller: ${bytes(base)} vs ${bytes(baseF)}")

    // appends inherit the tier (encode against the frozen codebook)
    VectorStoreOps.appendToVectorStore(delta, spark, base)
    VectorStoreOps.appendToVectorStore(delta, spark, baseF)
    assert(VectorStoreOps.readStore(spark, base).count() == emb.count())

    // search still answers every query through the decoded corpus, and
    // lands mostly where the float store does (PQ's declared lossiness
    // bounds the drift; the exact decoded-value contract is oracle-
    // pinned end-to-end by ann_pqstore_q)
    val got = VectorStoreOps
      .searchStore(queries, spark, base, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val gotF = VectorStoreOps
      .searchStore(queries, spark, baseF, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (got.map(t => (t._1, t._2)) & gotF).size.toDouble / gotF.size
    assert(overlap >= 0.25, s"pq search overlap vs float store: $overlap")
    assert(got.map(_._1) == gotF.map(_._1), "every query answered")

    // delete + compaction keep the tier (no silent decode-to-float)
    VectorStoreOps.deleteFromVectorStore(
      queries.select("vec_id").limit(3), spark, base)
    VectorStoreOps.compactVectorStore(spark, base, maxFilesPerCell = 1)
    assert(physicalSchema(base) == Set("item_id", "codes"),
      "maintenance rewrites must preserve the pq tier")
    assert(VectorStoreOps.readStore(spark, base).count() == emb.count() - 3)
    info(f"pq bytes ${bytes(base)} vs float ${bytes(baseF)}, " +
      f"top-10 overlap vs float store $overlap%.2f")
  }

  test("residual-pq tier: integer residual codes, tier survives append " +
    "and maintenance, recall >= plain pq on planted neighbors") {
    // clustered corpus — the ANN use case, and the regime residual
    // coding is FOR: once IVF has named the cell, the information left
    // is the small within-cluster offset, which is what the residual
    // codebook spends its 16 entries on (a plain-PQ codebook spends
    // them spanning the whole corpus). On unstructured data cells mean
    // little and the two tiers tie — measured, not asserted.
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val clustered = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val baseR = Files.createTempDirectory("vstore-pqres").toString
    val basePq = Files.createTempDirectory("vstore-pqres-plain").toString
    val baseF = Files.createTempDirectory("vstore-pqres-f32").toString
    val store = clustered.filter(col("vec_id") % 5 =!= 0)
    val delta = clustered.filter(col("vec_id") % 5 === 0)
    val cents = SimilarityOps.ivfCentroids(store, nlist = 8, iters = 1)
      .localCheckpoint(true) // the SAME frozen index for all three tiers
    VectorStoreOps.writeVectorStore(store, spark, baseR, cents,
      pqResidual = Some((8, 16)))
    // the apples-to-apples plain-PQ twin: same raw-seed (no-averaging)
    // codebook convention, same m/ksub — the only difference is WHAT the
    // codebook spends its 16 entries on (corpus spread vs within-cell
    // residual spread)
    VectorStoreOps.writeVectorStore(store, spark, basePq, cents,
      pqCodebook = Some(SimilarityOps.pqCodebooks(store, dim = 64)))
    VectorStoreOps.writeVectorStore(store, spark, baseF, cents)
    def physicalSchema(b: String) = {
      val c0 = new java.io.File(s"$b/items").listFiles()
        .filter(_.getName.startsWith("c=")).head
      val cell = c0.listFiles().filter(_.getName.startsWith("cid=")).head
      spark.read.parquet(cell.toString).schema.fieldNames.toSet
    }
    assert(physicalSchema(baseR) == Set("item_id", "rcodes"),
      s"residual store must persist residual codes only: ${physicalSchema(baseR)}")

    // planted neighbors: stored vectors nudged on one coordinate and
    // re-keyed — the query's true nearest neighbor IS the original.
    // nprobe = nlist removes probe recall from the comparison: what
    // remains is pure reconstruction quality.
    val planted = store.orderBy("vec_id").limit(20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(0.3f)).otherwise(x)).as("embedding"))
    def hits(b: String): Long = VectorStoreOps
      .searchStore(planted, spark, b, k = 3, nprobe = 8)
      .filter(col("item_id") === col("query_id") - 1000000L).count()
    def overlapF(b: String): Double = {
      val queries = clustered.filter(col("vec_id") % 50 === 0)
      val gotF = VectorStoreOps.searchStore(queries, spark, baseF,
        k = 10, nprobe = 8).select("query_id", "item_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = VectorStoreOps.searchStore(queries, spark, b,
        k = 10, nprobe = 8).select("query_id", "item_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & gotF).size.toDouble / gotF.size
    }
    val (hR, hP, hF) = (hits(baseR), hits(basePq), hits(baseF))
    val (oR, oP) = (overlapF(baseR), overlapF(basePq))
    assert(hF >= 18, s"float store must find planted originals: $hF/20")
    assert(hR >= hP,
      s"residual coding must not lose to plain pq on planted neighbors: " +
        s"residual $hR vs plain $hP (float $hF)")
    assert(hR >= 15, s"residual planted-neighbor recall floor: $hR/20")
    assert(oR >= oP,
      s"residual top-10 overlap vs float store must be >= plain pq: " +
        f"$oR%.2f vs $oP%.2f")
    assert(oR >= 0.35, f"residual overlap floor on clustered data: $oR%.2f")

    // append + maintenance inherit and preserve the tier
    VectorStoreOps.appendToVectorStore(delta, spark, baseR)
    assert(VectorStoreOps.readStore(spark, baseR).count() == clustered.count())
    VectorStoreOps.deleteFromVectorStore(
      clustered.select("vec_id").orderBy("vec_id").limit(3), spark, baseR)
    VectorStoreOps.compactVectorStore(spark, baseR, maxFilesPerCell = 1)
    assert(physicalSchema(baseR) == Set("item_id", "rcodes"),
      "maintenance rewrites must preserve the residual tier")
    assert(VectorStoreOps.readStore(spark, baseR).count() ==
      clustered.count() - 3)
    info(f"planted-neighbor hits/20: float $hF residual $hR plain $hP; " +
      f"top-10 overlap vs float: residual $oR%.2f plain $oP%.2f")
  }

  test("read-as-of: a gc=false delete keeps the prior manifest version " +
    "readable; vacuum retention floors it, loudly past the floor") {
    val base = Files.createTempDirectory("vstore-asof").toString
    val store = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val cents = SimilarityOps.ivfCentroids(store, nlist = 8, iters = 1)
      .localCheckpoint(true)
    VectorStoreOps.writeVectorStore(store, spark, base, cents)
    VectorStoreOps.appendToVectorStore(delta, spark, base)
    val vFull = VectorStoreOps.storeVersion(spark, base)
    def searchAt(v: Long) = VectorStoreOps
      .searchStoreAt(queries, spark, base, v, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val fullNow = VectorStoreOps
      .searchStore(queries, spark, base, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // delete a slice with DEFERRED gc: the snapshot survives
    VectorStoreOps.deleteFromVectorStore(
      emb.filter(col("vec_id") % 10 === 1).select("vec_id"), spark, base,
      gc = false)
    val vDel = VectorStoreOps.storeVersion(spark, base)
    assert(vDel > vFull, "a delete must advance the store version")
    assert(VectorStoreOps.readStoreAt(spark, base, vFull).count() ==
      emb.count(), "read-at the pre-delete version must see every vector")
    assert(searchAt(vFull) == fullNow,
      "search-at the pre-delete version must equal the pre-delete search")
    assert(VectorStoreOps.readStoreAt(spark, base, vDel).count() ==
      VectorStoreOps.readStore(spark, base).count())
    // a second gc=false mutation, then a RETAINING vacuum: the newest
    // prior version stays readable, the older one fails loudly
    VectorStoreOps.deleteFromVectorStore(
      emb.filter(col("vec_id") % 10 === 2).select("vec_id"), spark, base,
      gc = false)
    VectorStoreOps.vacuumStore(spark, base, retainVersions = 1)
    assert(VectorStoreOps.readStoreAt(spark, base, vDel).count() > 0,
      "the retained version must stay readable after the vacuum")
    val e = intercept[IllegalArgumentException] {
      VectorStoreOps.readStoreAt(spark, base, vFull).count()
    }
    assert(e.getMessage.contains("predates the retention"), e.getMessage)
    // retain=0 collapses to latest-only; the current read is unchanged
    val now = VectorStoreOps.readStore(spark, base).count()
    VectorStoreOps.vacuumStore(spark, base)
    assert(VectorStoreOps.readStore(spark, base).count() == now)
    intercept[IllegalArgumentException] {
      VectorStoreOps.readStoreAt(spark, base, vDel).count()
    }
  }

  test("store-served decontamination: exact vs brute force at " +
    "nprobe=nlist, a subset (never an invention) at lower nprobe") {
    val base = Files.createTempDirectory("vstore-dc").toString
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val test = emb.filter(col("vec_id") % 10 === 0)
    val cents = SimilarityOps.ivfCentroids(corpus, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(corpus, spark, base, cents)
    def flags(nprobe: Int) = VectorStoreOps
      .flagSimilarInStore(test, spark, base, minCos = 0.3, nprobe = nprobe)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    // nprobe = nlist probes every cell: candidates are ALL pairs, so the
    // flags equal the brute-force screen exactly (count, best cos,
    // first test id included)
    val exact = flags(8)
    val brute = corpus.select(col("vec_id").as("item_id"),
        col("embedding").as("cv"))
      .crossJoin(test.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")))
      .withColumn("cos",
        round(SimilarityOps.cosineFast(spark, col("qv"), col("cv")), 4))
      .filter(col("cos") >= 0.3)
      .groupBy("item_id")
      .agg(count(lit(1)).as("n"), max("cos").as("m"), min("query_id").as("f"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(exact == brute && exact.nonEmpty,
      s"full-probe flags must equal brute force (${exact.size} vs ${brute.size})")
    // fewer probes can only MISS (approximate recall), never invent a
    // flag or inflate its evidence
    val approx = flags(2)
    assert(approx.keySet.subsetOf(exact.keySet))
    approx.foreach { case (id, (n, m, f)) =>
      val (en, em, ef) = exact(id)
      assert(n <= en && m <= em, s"item $id evidence inflated")
      // the min test id over a SUBSET of the matches can only rise
      assert(f >= ef, s"item $id first_test_id fell below the exact one")
    }
  }

  test("deferred GC (gc=false): an in-flight reader resolved before the " +
    "delete keeps answering from its snapshot") {
    val base = Files.createTempDirectory("vstore-gc").toString
    val cents = SimilarityOps.ivfCentroids(emb, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(emb, spark, base, cents)
    // resolve a reader BEFORE the delete: its dir list is fixed
    val reader = VectorStoreOps.readStore(spark, base)
    val fullCount = emb.count()
    val delIds = emb.filter(col("vec_id") % 7 === 0).select("vec_id")
    VectorStoreOps.deleteFromVectorStore(delIds, spark, base, gc = false)
    // new resolutions see the post-delete state...
    assert(VectorStoreOps.readStore(spark, base).count() ==
      fullCount - delIds.count())
    // ...while the in-flight frame still reads its full snapshot (the
    // superseded dirs were not deleted)
    assert(reader.count() == fullCount,
      "deferred GC must keep the old snapshot's files readable")
    // the quiet-window sweep: vacuum removes exactly the unreferenced
    // dirs; committed reads are untouched
    val liveBefore = VectorStoreOps.readStore(spark, base)
      .select("item_id").collect().map(_.getLong(0)).toSet
    VectorStoreOps.vacuumStore(spark, base)
    val liveAfter = VectorStoreOps.readStore(spark, base)
      .select("item_id").collect().map(_.getLong(0)).toSet
    assert(liveAfter == liveBefore, "vacuum must not touch committed data")
    // every remaining (c, cid) dir is manifest-named — no orphans left
    val items = new java.io.File(s"$base/items")
    val remaining = items.listFiles().toSeq
      .filter(d => d.isDirectory && d.getName.startsWith("c="))
      .flatMap(c => c.listFiles().toSeq
        .filter(d => d.isDirectory && d.getName.startsWith("cid="))
        .map(d => s"${c.getName}/${d.getName}"))
    val deletedIds = delIds.collect().map(_.getLong(0)).toSet
    assert(remaining.nonEmpty)
    // and the old snapshot is now really gone: re-counting the pre-delete
    // frame fails or undercounts — the grace window has closed
    val postVacuum = scala.util.Try(reader.count()).toOption
    assert(!postVacuum.contains(fullCount),
      s"vacuum must reclaim the deferred dirs (got $postVacuum, deleted ${deletedIds.size})")
  }

  test("a store deleted down to zero vectors still accepts appends " +
    "(tier probe has no live dir to read)") {
    val base = Files.createTempDirectory("vstore-empty").toString
    val some = emb.filter(col("vec_id") % 100 === 0)
    val cents = SimilarityOps.ivfCentroids(emb, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(some, spark, base, cents)
    VectorStoreOps.deleteFromVectorStore(
      some.select("vec_id"), spark, base)
    // the store is empty but alive: a fresh append must land
    VectorStoreOps.appendToVectorStore(
      emb.filter(col("vec_id") % 100 === 1), spark, base)
    assert(VectorStoreOps.readStore(spark, base).count() ==
      emb.filter(col("vec_id") % 100 === 1).count())
  }

  test("append is visible to a reader opened in the same session") {
    val base = Files.createTempDirectory("vstore-vis").toString
    val store = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val cents = SimilarityOps.ivfCentroids(store, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(store, spark, base, cents)
    // force file-listing + manifest cache entries BEFORE the append —
    // the refresh in the manifest commit must invalidate them or the
    // delta silently never joins
    val before = VectorStoreOps.readStore(spark, base).count()
    VectorStoreOps.appendToVectorStore(delta, spark, base)
    val after = VectorStoreOps.readStore(spark, base).count()
    assert(before == store.count() && after == emb.count(),
      s"append must land and be visible: $before -> $after")
    // and the delta ids must be searchable
    val hits = VectorStoreOps
      .searchStore(queries, spark, base, k = 10, nprobe = 8)
      .filter(col("item_id") % 5 === 0).count()
    assert(hits > 0, "appended vectors must be reachable by search")
  }

  test("a swap torn mid-write leaves the prior committed manifest live " +
    "(delete's commit survives; reads, appends and the next swap work)") {
    val base = Files.createTempDirectory("vstore-torn-swap").toString
    val cents = SimilarityOps.ivfCentroids(emb, nlist = 8, iters = 1)
    VectorStoreOps.writeVectorStore(
      emb.filter(col("vec_id") % 5 =!= 0), spark, base, cents)
    // a real swap (delete rewrites touched cells + swaps the manifest)
    VectorStoreOps.deleteFromVectorStore(
      emb.filter(col("vec_id") % 10 === 0).select("vec_id"), spark, base)
    val committed = VectorStoreOps.readStore(spark, base)
      .select("item_id").collect().map(_.getLong(0)).toSet
    // crash mid-NEXT-swap: a manifest version with data files but no
    // _SUCCESS — poison rows naming nonexistent dirs prove resolution
    // never touches it (the old flat-overwrite scheme is exactly this
    // state with the previous manifest ALSO gone: a bricked store)
    val mdir = s"$base/_manifest"
    val tornV = new java.io.File(mdir).listFiles()
      .filter(_.getName.startsWith("v=")) 
      .map(_.getName.stripPrefix("v=").toLong).max + 1
    Seq((999L, 999L, Option.empty[Long])).toDF("c", "cid", "tag")
      .coalesce(1).write.parquet(s"$mdir/v=$tornV")
    val marker = new java.io.File(s"$mdir/v=$tornV/_SUCCESS")
    assert(marker.exists() && marker.delete(), "fixture: tear the marker")
    // reads resolve the prior committed state, not the torn version
    assert(VectorStoreOps.readStore(spark, base)
      .select("item_id").collect().map(_.getLong(0)).toSet == committed)
    // appends still land (into the live version)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    VectorStoreOps.appendToVectorStore(delta, spark, base)
    assert(VectorStoreOps.readStore(spark, base).count() ==
      committed.size + delta.count())
    // and the next real swap commits past the torn id and sweeps it
    VectorStoreOps.deleteFromVectorStore(
      delta.select("vec_id"), spark, base)
    assert(VectorStoreOps.readStore(spark, base)
      .select("item_id").collect().map(_.getLong(0)).toSet == committed)
    assert(!new java.io.File(s"$mdir/v=$tornV").exists(),
      "completed swap must retire the torn version dir")
  }
}
