package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{LayoutOps, StatsOps}

/** Oracle-gated round-trips through [[graft.ops.LayoutOps]]: the write
  * paths run for real (fresh temp dir per invocation, same precedent as
  * `bam_rewrite`), then the READ-BACK result is hash-compared against
  * DuckDB running the equivalent query on the ORIGINAL parquet — a
  * layout rewrite must be a semantic no-op, and this is the gate entry
  * that proves it (dropped rows, truncated values, or a lang dir routed
  * wrong all flip the hash). Plan-level layout properties (files per
  * dir, partition pruning, Exchange-free bucketed join) are asserted in
  * LayoutSpec — the gate checks the data, the spec checks the layout. */
object LayoutQueries {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  private def tmp(prefix: String): String = scratchDir(prefix)

  val all: Seq[Q] = Seq(
    // Partitioned+salted write → partition-pruned read-back. The filter
    // on `lang` is satisfied by DIRECTORY pruning on the Spark side
    // (zero non-matching files opened; asserted in LayoutSpec) while
    // DuckDB scans the flat original — equal hashes prove the routing
    // moved every row to its correct dir.
    q(
      "layout_part_roundtrip",
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE lang IN ('en','zh') GROUP BY lang""".stripMargin
    ) { (s, dir) =>
      val out = tmp("graft-layout-part")
      LayoutOps.writePartitioned(
        tDocs(s, dir), out,
        partCols = Seq("lang"), sortCols = Seq("doc_id"),
        filesPerDir = 2, distCol = Some("doc_id"))
      s.read.parquet(out)
        .filter(col("lang").isin("en", "zh"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
    },

    // Bucketed write on the join key → Exchange-free read-back join
    // (plan asserted in LayoutSpec; here the aggregate over the joined
    // tables must match DuckDB joining the original flat parquet).
    q(
      "layout_bucket_join",
      """SELECT o_orderpriority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      val out = tmp("graft-layout-bkt")
      LayoutOps.writeBucketed(
        t(s, dir, "orders"), s, "graft_bkt_orders", s"$out/orders", 8, "o_orderkey")
      LayoutOps.writeBucketed(
        t(s, dir, "lineitem"), s, "graft_bkt_lineitem", s"$out/lineitem", 8, "l_orderkey")
      s.table("graft_bkt_orders")
        .join(s.table("graft_bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(D) * (lit(1) - col("l_discount").cast(D)))
            .cast("double").as("revenue"))
    },

    // Z-order clustering round-trip: orders lands z-ordered on two
    // derived dimensions, the read-back applies a 2-D box predicate
    // (the query shape Z-layout exists to accelerate; file-level skipping
    // is asserted in LayoutSpec), and DuckDB reproduces the box AND the
    // Morton arithmetic bit-for-bit on the original parquet — equal
    // hashes prove the interleave expression and the clustered rewrite
    // both preserved every row.
    q(
      "layout_zorder", {
        val zSql = (0 until 8).map(i =>
          s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
          .mkString(" + ")
        s"""WITH b AS (
           |  SELECT o_orderkey, o_custkey % 256 AS x, o_orderkey % 256 AS y
           |  FROM orders
           |)
           |SELECT o_orderkey, x, y, CAST($zSql AS BIGINT) AS z
           |FROM b WHERE x BETWEEN 32 AND 47 AND y BETWEEN 64 AND 79""".stripMargin
      }
    ) { (s, dir) =>
      val out = tmp("graft-layout-z")
      LayoutOps.writeZOrdered(
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            (col("o_custkey") % 256).as("x"),
            (col("o_orderkey") % 256).as("y")),
        out, col("x"), col("y"), numFiles = 16, bits = 8)
      s.read.parquet(out)
        .filter(col("x").between(32, 47) && col("y").between(64, 79))
        .select("o_orderkey", "x", "y", "z")
    },

    // Manifest-based data skipping is a semantic no-op: documents land
    // range-clustered with a per-file min/max manifest (80 % bulk write +
    // 20 % incremental append, so the gate also covers the append-time
    // manifest maintenance), the read-back consults the MANIFEST to open
    // only files intersecting the n_chars box, and DuckDB full-scans the
    // original with the same predicate — equal hashes prove skipping
    // dropped no in-range row from either the bulk or the appended files.
    // File-count pruning itself is asserted in StatsSkippingSpec.
    q(
      "layout_skipping",
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE n_chars BETWEEN 100 AND 200
        |GROUP BY lang""".stripMargin
    ) { (s, dir) =>
      val out = tmp("graft-layout-skip")
      val docs = tDocs(s, dir)
      StatsOps.writeWithStats(
        docs.filter(col("doc_id") % 5 =!= 0), s, out,
        sortCols = Seq("n_chars"), statsCols = Seq("n_chars"), numFiles = 8)
      StatsOps.appendWithStats(
        docs.filter(col("doc_id") % 5 === 0), s, out,
        sortCols = Seq("n_chars"), statsCols = Seq("n_chars"), numFiles = 2)
      StatsOps.readSkipping(s, out,
          Seq(StatsOps.ColRange("n_chars", Some(100L), Some(200L))))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
    },

    // Small-files compaction is a semantic no-op: fragment documents into
    // 32 shards, compact to ~one file (size-derived), aggregate the
    // result. DuckDB aggregates the original — equal hashes prove no row
    // was lost or duplicated by either rewrite.
    q(
      "layout_compact",
      """SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY source""".stripMargin
    ) { (s, dir) =>
      val base = tmp("graft-layout-cmp")
      tDocs(s, dir).repartition(32)
        .write.mode("overwrite").parquet(s"$base/frag")
      LayoutOps.compact(s, s"$base/frag", s"$base/packed", 256L * 1024 * 1024)
      s.read.parquet(s"$base/packed")
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
    }
  )
}
