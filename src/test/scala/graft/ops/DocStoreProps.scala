package graft.ops

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Randomized differential tests for [[DocStoreOps]] and
  * [[VersionedStoreOps]]: random changelogs (hot keys, duplicate
  * sequences, deletes of absent keys, stale re-sends) applied in random
  * batch splits must equal a sequential in-memory LWW model, and the
  * versioned store's every intermediate snapshot must equal the model's
  * prefix states. The model re-implements the documented election
  * directly (max sequence; delete wins a tie), so drift in the window
  * ranking, the bucket plumbing or the tombstone resolution shows up as
  * a value diff. */
case class Ch(k: Long, v: String, seq: Long, op: String)

class DocStoreProps extends SparkTestBase {
  import spark.implicits._

  /** Sequential model: fold changes one at a time, mirroring the
    * engine's TOTAL election order — seq desc, delete-beats-upsert on a
    * seq tie, then greatest payload (here: the value string, the only
    * differing orderable field) — so the model is arrival-order-free
    * like the store itself must be. */
  private def model(init: Seq[(Long, String, Long)],
                    batches: Seq[Seq[Ch]]): Map[Long, (String, Long)] = {
    // (value, seq, deleted): a delete also carries its winning seq so a
    // later stale update cannot resurrect the row
    var st = init.map { case (k, v, s) => k -> (v, s, false) }.toMap
    batches.flatten.foreach { c =>
      val cd = c.op == "D"
      val beats = st.get(c.k).forall { case (v, s, deleted) =>
        c.seq > s ||
          (c.seq == s && (
            (cd && !deleted) ||            // delete outranks upsert
            (cd == deleted && c.v > v)))   // same class: payload decides
      }
      if (beats) st = st.updated(c.k, (c.v, c.seq, cd))
    }
    st.collect { case (k, (v, s, false)) => k -> (v, s) }
  }

  private def storeRows(base: String): Map[Long, (String, Long)] =
    DocStoreOps.readDocStore(spark, base)
      .select("k", "v", "seq").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("random changelogs in random splits equal the sequential model") {
    val rnd = new Random(20260814L)
    (1 to 4).foreach { trial =>
      val init = (0L until 8L).filter(_ => rnd.nextBoolean())
        .map(k => (k, s"i$k", rnd.between(0L, 5L)))
      val changes = Seq.fill(60)(Ch(
        rnd.between(0L, 12L), // keys beyond init: insert paths
        s"v${rnd.nextInt(100)}",
        rnd.between(0L, 20L), // dense: real seq ties and stale re-sends
        if (rnd.nextInt(4) == 0) "D" else "U"))
      // random batch boundaries, preserving order
      val cuts = (Seq(0, changes.length) ++
        Seq.fill(rnd.nextInt(4))(rnd.nextInt(changes.length))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => changes.slice(a, b) }

      // in-place store: batches ordered by max seq per key within each
      // batch; LWW makes the SPLIT POINTS irrelevant only when later
      // batches don't carry lower sequences for a key — which random
      // data violates, so the engine's cross-batch election (store rows
      // keep their seq) is exactly what's under test
      val base = Files.createTempDirectory(s"docstore-prop$trial").toString
      DocStoreOps.writeDocStore(init.toDF("k", "v", "seq"),
        spark, base, "k", "seq", 4)
      batches.filter(_.nonEmpty).foreach { b =>
        DocStoreOps.applyChanges(b.toDF("k", "v", "seq", "op"),
          spark, base, "k", "seq", "op", 4)
      }
      val want = model(init, batches)
      assert(storeRows(base) == want,
        s"trial $trial: ${storeRows(base)} vs $want")

      // versioned store: same batches; every snapshot = model prefix
      val vbase = Files.createTempDirectory(s"vstore-prop$trial").toString
      VersionedStoreOps.writeVersioned(init.toDF("k", "v", "seq"),
        spark, vbase, "k", "seq", 4)
      val applied = batches.filter(_.nonEmpty)
      applied.foreach { b =>
        VersionedStoreOps.applyChangesVersioned(b.toDF("k", "v", "seq", "op"),
          spark, vbase, "k", "seq", "op", 4)
      }
      def snapshot(i: Int): Map[Long, (String, Long)] = {
        val wantI = model(init, applied.take(i))
        if (wantI.isEmpty) Map.empty // readVersion refuses an empty store
        else VersionedStoreOps.readVersion(spark, vbase, Some(i.toLong))
          .select("k", "v", "seq").collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      }
      (0 to applied.length).foreach { i =>
        assert(snapshot(i) == model(init, applied.take(i)),
          s"trial $trial snapshot $i")
      }
      // vacuum to a random horizon: every surviving snapshot must still
      // equal its model prefix (the pruned dirs were truly unreferenced)
      if (applied.nonEmpty) {
        val keepFrom = rnd.nextInt(applied.length) + 1
        VersionedStoreOps.vacuum(spark, vbase, keepFrom.toLong)
        (keepFrom to applied.length).foreach { i =>
          assert(snapshot(i) == model(init, applied.take(i)),
            s"trial $trial post-vacuum($keepFrom) snapshot $i")
        }
      }
    }
  }

  /** A seq-tie between an update and a delete in DIFFERENT batches:
    * whichever arrives second must not overturn delete-wins. */
  test("delete-wins ties hold across batch boundaries, both arrival orders") {
    Seq(("U", "D"), ("D", "U")).foreach { case (op1, op2) =>
      val base = Files.createTempDirectory("docstore-tie").toString
      DocStoreOps.writeDocStore(Seq((1L, "x", 0L)).toDF("k", "v", "seq"),
        spark, base, "k", "seq", 2)
      DocStoreOps.applyChanges(Seq(Ch(1L, "a", 5L, op1)).toDF("k", "v", "seq", "op"),
        spark, base, "k", "seq", "op", 2)
      DocStoreOps.applyChanges(Seq(Ch(1L, "b", 5L, op2)).toDF("k", "v", "seq", "op"),
        spark, base, "k", "seq", "op", 2)
      assert(storeRows(base) == Map.empty,
        s"order ($op1,$op2): the tied delete must win")
    }
  }
}
