package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair graph — the cluster-
  * resolution step that turns near-duplicate PAIRS (MinHash / SimHash /
  * Jaccard joins in [[DedupOps]]) into dedup CLUSTERS with one surviving
  * representative per cluster.
  *
  * Algorithm: the alternating large-star / small-star method (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
  * literature), which converges in O(log n) rounds on any graph, vs the
  * O(diameter) rounds of naive label propagation. Each round is expressed
  * as DataFrame min-aggregations and equi-joins:
  *
  *  - large-star: every node attaches its LARGER neighbors to the minimum
  *    of its neighborhood (including itself);
  *  - small-star: every node attaches its smaller-or-equal neighbors (and
  *    itself) to the minimum of its neighborhood.
  *
  * Neither step ever materializes a neighbor LIST (`collect_list` would put
  * a crawl-scale hot node's whole neighborhood in one row): the per-node
  * minimum is a partial-aggregated `min()`, and the attach step is an
  * equi-join against that one-row-per-node frame — both skew-tolerant
  * (AQE skew-join handles the residual hot keys in the join).
  *
  * Each round ends in a lineage cut: the edge set is the loop-carried
  * state, and checkpointing truncates the lineage so round k doesn't
  * re-execute rounds 1..k-1. By default the cut is
  * `localCheckpoint(eager = true)` (executor blocks — right for local
  * mode, fastest on a healthy cluster); passing `checkpointDir` routes it
  * to a reliable `checkpoint()` so the loop state survives executor loss.
  * Convergence is detected by an order-insensitive edge-set signature
  * (count + sum of per-edge hashes) — one cheap aggregate per round over
  * the just-materialized blocks, no `except()` anti-join.
  *
  * Reference analog: the closest surface in hammerlab/spark-bam is the
  * pair-production side (check/compare joins); cluster resolution is part
  * of the beyond-the-reference LLM-pipeline surface (SURVEY.md §2 "beyond").
  */
object GraphOps {

  /** Edges (u, v) with u > v — both steps preserve this orientation. */
  private def orient(e: DataFrame): DataFrame =
    e.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))

  /** Attach each node's larger neighbors to its neighborhood minimum. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
    val mins = sym.groupBy("u")
      .agg(min("v").as("__mv"))
      .select(col("u"), least(col("__mv"), col("u")).as("__m"))
    // v > u >= m, so src > dst holds and no self-loops can appear.
    // NO distinct here: duplicate edges can't change smallStar's min
    // aggregation, and smallStar's own distinct canonicalizes the round's
    // output — dropping the dedup saves one full shuffle per round.
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("__m").as("dst"))
  }

  /** Attach each node's smaller neighbors AND itself to the minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val o = orient(e) // src > dst for every edge
    val mins = o.groupBy(col("src").as("u")).agg(min("dst").as("__m"))
    o.select(col("src").as("u"), col("dst").as("v"))
      .join(mins, "u")
      .filter(col("v") =!= col("__m"))
      .select(col("v").as("src"), col("__m").as("dst"))
      .union(mins.select(col("u").as("src"), col("__m").as("dst")))
      .distinct()
  }

  /** Order-insensitive signature of an edge set: equal sets ⇒ equal
    * signature; unequal signature ⇒ sets changed this round. The hash sum
    * accumulates in decimal(38,0) — a long sum would overflow under ANSI.
    * The implication is ONE-SIDED: a matching signature is confirmed with
    * an exact set compare before the loop declares convergence. */
  private def signature(e: DataFrame): (Long, String) = {
    val r = e.agg(count(lit(1)),
      sum(xxhash64(col("src"), col("dst"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
    (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toPlainString)
  }

  /** Free a cut frame's storage explicitly once the NEXT round's cut has
    * materialized — the PeriodicCheckpointer pattern. For a local
    * checkpoint that's the executor blocks (the ContextCleaner only
    * reclaims them at some later driver GC); for a reliable checkpoint
    * it's ALSO the round's files on DFS — without the delete, an N-round
    * loop retains N copies of the edge state for its whole life
    * (unpersist only drops blocks, and `checkpoint()` files are otherwise
    * reclaimed only under spark.cleaner.referenceTracking.cleanCheckpoints
    * at driver GC). Only the FINAL round's files outlive the loop: the
    * returned DataFrame reads from them. */
  private def freeCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
        }
        r.rdd.unpersist(blocking = false)
      case _ =>
    } catch { // best-effort: GC remains the backstop
      case scala.util.control.NonFatal(_) =>
    }

  /** Round-end lineage cut. `localCheckpoint` (executor blocks) is right
    * for local mode and fastest on a healthy cluster, but the blocks are
    * the loop's ONLY copy of the edge state — a lost executor kills the
    * whole loop. With a `checkpointDir` the state goes to reliable storage
    * (`sparkContext.setCheckpointDir` + `checkpoint()`), surviving
    * executor loss at the cost of a DFS write per round.
    *
    * The local cut is LAZY: every call site runs the round's
    * [[signature]] aggregate immediately after, and that one job both
    * computes the signature and persists the cut's blocks — an eager
    * cut spent a whole extra materialization job per round just to then
    * aggregate what it had materialized. The reliable path stays eager:
    * a lazy `checkpoint()` recomputes the RDD a second time to write
    * the checkpoint files (the classic double-computation), which is
    * exactly the cost the eager form avoids. */
  private def cut(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = false)

  /** Connected components of the undirected graph given as an edge list.
    * Returns one row per node that appears in any NON-degenerate edge:
    * (`id`, `component`) where `component` is the smallest node id
    * reachable from `id`. Self-loops and duplicate/reversed edges are
    * tolerated; a node whose ONLY edges are self-loops is treated as
    * edgeless — like edge-free nodes it doesn't appear, and the caller's
    * left-join + coalesce assigns it its own id (see `dedup_clusters`).
    *
    * `checkpointDir`: when set, each round's lineage cut goes to reliable
    * storage instead of executor blocks — see [[cut]]. Results and round
    * counts are identical either way (GraphOpsSpec pins this). */
  def connectedComponents(edges: DataFrame, srcCol: String = "src",
                          dstCol: String = "dst", maxIter: Int = 50,
                          checkpointDir: Option[String] = None): DataFrame =
    connectedComponentsWithRounds(edges, srcCol, dstCol, maxIter, checkpointDir)._1

  /** [[connectedComponents]] plus the number of alternating rounds it took
    * to converge — the O(log n) bound made observable (GraphOpsSpec pins
    * it on a worst-case path graph). */
  def connectedComponentsWithRounds(
      edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 50, checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val reliable = checkpointDir.isDefined
    val sc = edges.sparkSession.sparkContext
    // setCheckpointDir mutates GLOBAL SparkContext state: remember any
    // pre-existing dir and restore it after the loop, so this loop never
    // clobbers another checkpoint user's configuration for the rest of
    // the application.
    val prevDir = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    try {
      var e = cut(orient(
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
        .distinct(), reliable)
      var sig = signature(e)
      var converged = sig._1 == 0L
      var it = 0
      while (!converged && it < maxIter) {
        val next = cut(smallStar(largeStar(e)), reliable)
        val nsig = signature(next)
        // the signature is a fast pre-check; counts being equal, ONE except
        // direction run once at the matching round makes convergence EXACT
        // (a hash-sum collision can only delay, never fake, a fixpoint).
        // Plain except, not exceptAll: both frames are distinct sets by
        // construction (each round ends in .distinct()), and except is a
        // cheap left-anti join where exceptAll builds count machinery
        converged = nsig == sig && next.except(e).isEmpty
        // round k's cut has materialized: round k-1's blocks AND (for the
        // reliable path) its checkpoint files are now dead — drop them
        freeCheckpoint(e)
        e = next
        sig = nsig
        it += 1
      }
      require(converged, s"connectedComponents did not converge in $maxIter rounds")
      // fixpoint = disjoint stars (child, root): every child points at its
      // component's minimum; roots name themselves
      (e.select(col("src").as("id"), col("dst").as("component"))
        .union(e.select(col("dst").as("id"), col("dst").as("component")))
        .distinct(), it)
    } finally if (checkpointDir.isDefined && prevDir != checkpointDir) {
      // best-effort restore; un-setting (prev None) has no public API
      // path on a non-local master, hence the guard + swallow
      try prevDir.orElse(if (sc.isLocal) Some(null) else None)
        .foreach(d => sc.setCheckpointDir(d))
      catch { case scala.util.control.NonFatal(_) => }
    }
  }

  /** One loop-body round exposed for plan audits (DumpPlans). */
  private[graft] def oneRoundForPlanAudit(e: DataFrame): DataFrame =
    smallStar(largeStar(orient(e).distinct()))

  /** Fixed-point-integer PageRank: `iters` rounds of the power
    * iteration with every quantity held in scaled integers (`scale` =
    * one unit of total rank mass) and FLOOR division everywhere — no
    * float in the loop, so the result is bit-reproducible across
    * partitionings AND across engines (DuckDB replicates it with `//`;
    * the gate hash-compares all node ranks exactly).
    *
    * Each round is one equi-join (edges ⋈ current ranks ⋈ static
    * out-degrees) + one sum per destination + a left join back onto the
    * node set — the same shuffle shape as a round of
    * [[connectedComponents]], state is one row per node, and each round
    * ends in the same eager lineage cut. Out-degrees and the node set
    * are computed once. Multi-edges contribute once per occurrence
    * (pre-`distinct` the edges for simple-graph semantics). Floor
    * division leaks ≤1 unit of mass per (node, round) — at
    * scale = 1e12 that is relative error ~1e-9 per round, the price of
    * exactness-as-reproducibility. Dangling nodes (no out-edges) drop
    * their mass, the standard simplification. */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                         iters: Int = 3, scale: Long = 1000000000000L,
                         dampPct: Int = 85, cutEvery: Int = 4): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100 && cutEvery >= 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    // identical bracketing to the oracle SQL: ((15·scale) div 100) div n
    val base = ((100L - dampPct) * scale / 100L) / n
    var r = nodes.withColumn("r", lit(scale / n))
    // Lineage cuts are PERIODIC (PeriodicCheckpointer cadence), not
    // per-round: each eager cut is a full materialization job, and a
    // handful of join+agg levels between cuts is a plan Catalyst handles
    // easily — at the default cadence a 3-round call runs as ONE job
    // (the final cut, which the loop always takes so the static pins can
    // be freed below) instead of three. Long loops still cut every
    // `cutEvery` rounds to stop lineage (and optimizer time) growing
    // without bound.
    var lastCut: Option[DataFrame] = None
    (0 until iters).foreach { i =>
      val inmass = e
        .join(r.withColumnRenamed("id", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("id"), expr("r div outdeg").as("c"))
        .groupBy("id").agg(sum("c").as("inmass"))
      val next = nodes.join(inmass, Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"$dampPct * coalesce(inmass, 0L) div 100")).as("r"))
      if (i == iters - 1 || (i + 1) % cutEvery == 0) {
        r = next.localCheckpoint(true)
        // the new cut is materialized: the previous cut's blocks are dead
        lastCut.foreach(freeCheckpoint)
        lastCut = Some(r)
      } else r = next
    }
    // The final round's cut is eagerly materialized, so the three static
    // pins (edges, node set, out-degrees) are dead the moment the loop
    // exits — free them NOW rather than leaking one edge-sized block set
    // per invocation for the session's lifetime (a 135-query bench session
    // accumulated enough of these to distort unrelated queries' timings).
    freeCheckpoint(e); freeCheckpoint(nodes); freeCheckpoint(outdeg)
    // The result itself is also a pin (it must be: the caller reads it).
    // Bound the per-session debt by freeing the previous invocation's
    // result when the next one completes — but ONLY if the caller has
    // already dropped it (weak reference cleared): eagerly freeing a
    // result the caller still holds would make a perfectly reasonable
    // compare-two-graphs usage crash with missing checkpoint blocks. A
    // still-held previous result stays the caller's responsibility
    // (`GraphOps.free(df)`, or the GC + ContextCleaner backstop once
    // they drop it).
    lastPageRank.synchronized {
      Option(lastPageRank.get(edges.sparkSession)).foreach { prev =>
        if (prev.ref.get() == null) prev.rdds.foreach(freeRdd(edges.sparkSession, _))
      }
      val it = lastPageRank.keySet.iterator
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      lastPageRank.put(edges.sparkSession,
        Retained(new java.lang.ref.WeakReference(r), checkpointRdds(r)))
    }
    r
  }

  /** One-slot per-session memo of the last [[pageRankFixedPoint]] result:
    * the next invocation frees the previous result's blocks IF the caller
    * no longer holds the DataFrame, bounding the session-lifetime pin
    * debt to the results still actually in use. */
  private final case class Retained(
      ref: java.lang.ref.WeakReference[DataFrame],
      rdds: Seq[org.apache.spark.rdd.RDD[_]])
  private val lastPageRank =
    new java.util.IdentityHashMap[org.apache.spark.sql.SparkSession, Retained]()

  private def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] = {
    val out = Seq.newBuilder[org.apache.spark.rdd.RDD[_]]
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => out += r.rdd
      case _ =>
    }
    out.result()
  }

  private def freeRdd(spark: org.apache.spark.sql.SparkSession,
                      rdd: org.apache.spark.rdd.RDD[_]): Unit =
    try {
      rdd.getCheckpointFile.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
      rdd.unpersist(blocking = false)
    } catch { case scala.util.control.NonFatal(_) => }

  /** Release the executor blocks (and any reliable-checkpoint files) pinned
    * by a DataFrame this module returned. Safe to call on any frame —
    * non-checkpoint frames are a no-op. */
  def free(df: DataFrame): Unit = freeCheckpoint(df)

  /** Full cluster assignment for a document set: every doc gets the min
    * doc-id of its near-dup cluster (itself when unpaired). The survivor
    * set of a dedup pass is `filter(id === cluster)`. */
  def clusterAssign(docs: DataFrame, idCol: String, pairs: DataFrame,
                    aCol: String = "id_a", bCol: String = "id_b",
                    maxIter: Int = 50,
                    checkpointDir: Option[String] = None): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol, maxIter, checkpointDir)
    docs.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
  }

  /** Triangle count + global clustering coefficient, one row:
    * `(n_edges, n_wedges, n_triangles, gcc)`.
    *
    * Degree-ordered orientation (the MapReduce triangle-counting
    * formulation): each undirected edge points from its lower-(degree,
    * id) endpoint, so every triangle is generated exactly once from its
    * lowest-rank apex AND per-node wedge fan-out is bounded by
    * out-degree ≤ O(√m) — the skew guard that keeps the wedge join
    * alive on power-law graphs where a raw hub-adjacency self-join is
    * quadratic in the hub degree. `n_wedges` is the standard open-wedge
    * count Σ C(deg, 2); `gcc_ppm = 3·triangles·10^6 div wedges` — the
    * global clustering coefficient in exact integer parts-per-million
    * (cross-engine ROUND conventions differ; integer division doesn't). */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      // three consumers (degrees, orientation, closing join): one
      // materialization — LAZY, the nEdges count below persists the
      // blocks as it runs — freed before returning the one-row result
      .localCheckpoint(false)
    val deg = e.select(col("a").as("id"))
      .unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg"))
    val nEdges = e.count()
    // coalesce: sum over an EMPTY degree frame is null (a dedup pipeline
    // with zero near-dup pairs reaches here with no edges)
    val nWedges = deg.agg(coalesce(sum(expr("dg * (dg - 1) div 2")), lit(0L)))
      .head().getLong(0)
    val withDeg = e
      .join(deg.select(col("id").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("dg").as("db")), "b")
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = withDeg.select(
      when(aLower, col("a")).otherwise(col("b")).as("u"),
      when(aLower, col("b")).otherwise(col("a")).as("v"),
      when(aLower, col("db")).otherwise(col("da")).as("dv"))
    val vLower = col("x.dv") < col("y.dv") ||
      (col("x.dv") === col("y.dv") && col("x.v") < col("y.v"))
    val wedges = o.as("x").join(o.as("y"),
        col("x.u") === col("y.u") && vLower)
      .select(col("x.v").as("p"), col("y.v").as("q"))
    // the wedge's endpoints are rank-ordered, so the closing edge — if
    // it exists — is oriented exactly p→q: one equi-join, no OR
    val nTri = wedges.join(o.select(col("u").as("p"), col("v").as("q")),
      Seq("p", "q")).count()
    // Dataset.unpersist only consults the CacheManager — it is a no-op
    // for a localCheckpoint's blocks; freeCheckpoint releases them
    freeCheckpoint(e)
    val gccPpm = if (nWedges == 0) 0L else 3L * nTri * 1000000L / nWedges
    import spark.implicits._
    Seq((nEdges, nWedges, nTri, gccPpm))
      .toDF("n_edges", "n_wedges", "n_triangles", "gcc_ppm")
  }
}
