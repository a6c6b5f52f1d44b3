package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Connected components: differential against a driver-side union-find on
  * seeded random graphs, plus adversarial shapes (long path = worst-case
  * diameter, hub star = worst-case degree skew, duplicate/reversed/self
  * edges, empty input). */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference union-find (path compression, driver-side, small inputs). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots chosen as min via the max->min union above; normalize anyway
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val groups = nodes.groupBy(find)
    groups.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 50 + trial * 40
      val edges = Seq.fill(n * 3 / 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) == unionFind(edges), s"trial $trial")
    }
  }

  test("long path converges (log rounds, not diameter rounds)") {
    val edges = (0L until 255L).map(i => (i, i + 1))
    val (df, rounds) =
      GraphOps.connectedComponentsWithRounds(edges.toDF("src", "dst"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 255L).map(_ -> 0L).toMap)
    // diameter 255; the alternating algorithm must land well under it
    assert(rounds <= 12, s"took $rounds rounds on a 256-node path")
  }

  test("hub star with reversed, duplicate and self edges") {
    val edges = (1L to 40L).map(i => (100L, i)) ++ // hub as src
      (1L to 40L).map(i => (i, 100L)) ++           // reversed dups
      Seq((5L, 5L), (100L, 100L))                  // self loops
    val got = run(edges)
    val expect = ((1L to 40L) :+ 100L).map(_ -> 1L).toMap
    assert(got == expect)
  }

  test("two components stay separate; empty input yields empty result") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L))
    assert(run(edges) == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
    assert(run(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("adversarial families: bridged cliques, bipartite, negative ids") {
    // two 12-cliques bridged by one edge -> single component
    val cliqueA = for (i <- 0L until 12L; j <- (i + 1) until 12L) yield (i, j)
    val cliqueB = cliqueA.map { case (a, b) => (a + 100, b + 100) }
    val bridged = cliqueA ++ cliqueB ++ Seq((11L, 100L))
    assert(run(bridged) == unionFind(bridged))
    // complete bipartite K(5,5) with interleaved ids
    val bip = for (i <- 0L until 5L; j <- 0L until 5L) yield (i * 2, j * 2 + 1)
    assert(run(bip) == unionFind(bip))
    // negative ids: min must handle sign correctly
    val neg = Seq((-5L, 3L), (3L, -9L), (7L, 8L))
    assert(run(neg) == Map(-5L -> -9L, 3L -> -9L, -9L -> -9L, 7L -> 7L, 8L -> 7L))
  }

  test("maxIter exhaustion fails loudly, never returns a non-fixpoint") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      GraphOps.connectedComponents(edges.toDF("src", "dst"), maxIter = 1)
    }
  }

  test("superseded round checkpoints are freed, not accumulated") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val edges = (0L until 127L).map(i => (i, i + 1)) // several rounds
    GraphOps.connectedComponents(edges.toDF("src", "dst")).collect()
    // only the FINAL round's checkpoint may remain pinned (plus nothing
    // from the earlier rounds); without freeCheckpoint this grows by one
    // edge-set copy per round
    val leaked = sc.getPersistentRDDs.size - before
    assert(leaked <= 2, s"$leaked checkpointed RDDs left behind")
  }

  test("reliable checkpointDir: identical result and round count") {
    // the cluster-durability path: every round's lineage cut goes to the
    // reliable checkpoint dir instead of executor blocks; results and
    // convergence behavior must be bit-identical to the local-mode cut
    val dir = java.nio.file.Files.createTempDirectory("graft-ccdir")
    val edges = ((0L until 100L).map(i => (i, i + 1)) ++
      Seq((200L, 201L), (201L, 202L), (300L, 300L))).toDF("src", "dst")
    val prevCpDir = spark.sparkContext.getCheckpointDir
    val (local, localRounds) =
      GraphOps.connectedComponentsWithRounds(edges, "src", "dst")
    val (reliable, reliableRounds) = GraphOps.connectedComponentsWithRounds(
      edges, "src", "dst", checkpointDir = Some(dir.toString))
    val l = local.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = reliable.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l == r)
    assert(localRounds == reliableRounds)
    // the loop must not clobber the context-global checkpoint dir
    assert(spark.sparkContext.getCheckpointDir == prevCpDir,
      "checkpoint dir not restored after the loop")
    // the reliable run actually wrote checkpoint state to the dir...
    val wrote = java.nio.file.Files.walk(dir).filter(
      java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "no checkpoint files written to checkpointDir")
    // ...but superseded ROUNDS' files were deleted as the loop advanced
    // (PeriodicCheckpointer pattern): a multi-round run keeps only the
    // final round's rdd-* directory, not one copy per round
    assert(reliableRounds > 1, "fixture must force a multi-round loop")
    import scala.jdk.CollectionConverters._
    val rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("rdd-")).toList
    assert(rddDirs.size <= 1,
      s"${rddDirs.size} round checkpoints retained: $rddDirs")
  }

  test("pageRankFixedPoint: mass accounting, hub dominance, partitioning invariance") {
    import spark.implicits._
    // star: hub 0 ↔ spokes 1..8, plus a 2-cycle (10, 11) off to the side
    val und = (1L to 8L).flatMap(i => Seq((0L, i), (i, 0L))) ++
      Seq((10L, 11L), (11L, 10L))
    val edges = und.toDF("src", "dst")
    val scale = 1000000000000L
    def run(parts: Int): Map[Long, Long] =
      GraphOps.pageRankFixedPoint(edges.repartition(parts), "src", "dst",
          iters = 3, scale = scale)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = run(4)
    assert(r.size == 11)
    // total mass: ≤ scale, and floor division loses < 1 unit per
    // (node, round) + base rounding — far under n·(iters+1) units
    val total = r.values.sum
    assert(total <= scale && scale - total < 11L * 5,
      s"mass off: $total vs $scale")
    // the hub concentrates its spokes' mass; spokes are all equal
    assert(r(0L) > r(1L) * 4, s"hub must dominate: ${r(0L)} vs ${r(1L)}")
    assert((1L to 8L).map(r).toSet.size == 1, "spokes are symmetric")
    // the isolated 2-cycle keeps its own mass: each node ~scale/11
    assert(math.abs(r(10L) - scale / 11) < scale / 1000)
    // integer arithmetic ⇒ bit-identical under any partitioning
    assert(run(1) == r && run(17) == r)
  }

  test("triangleStats counts a known graph exactly once per triangle") {
    // K4 on {1,2,3,4} (4 triangles, 6 edges, Σ C(3,2)=12 wedges) plus a
    // pendant 4-5 (wedges +3: node 4 now deg 4 → C(4,2)=6) and an
    // isolated edge 6-7; duplicate and reversed inputs must not
    // double-count
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L), (2L, 1L), (1L, 2L)).toDF("src", "dst")
    val r = GraphOps.triangleStats(e, "src", "dst").head()
    assert(r.getAs[Long]("n_edges") == 8)
    // degrees: 1,2,3 -> 3; 4 -> 4; 5 -> 1; 6,7 -> 1 ⇒ 3·3 + 6 = 15
    assert(r.getAs[Long]("n_wedges") == 15)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Long]("gcc_ppm") == 3L * 4 * 1000000 / 15)
  }

  test("clusterAssign covers unpaired docs with their own id") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val got = GraphOps.clusterAssign(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 2L))
    // survivors = fixpoints of the assignment
    assert(got.collect { case (d, c) if d == c => d }.toSet == Set(1L, 2L, 3L))
  }
}
