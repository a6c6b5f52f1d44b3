package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scratch: dump `.explain("formatted")` evidence for the optimization
  * round (`Test/runMain graft.DumpExplain <outDir> <suffix> <q1,q2,...>`).
  *
  * Store-lifecycle queries do their interesting work in INTERMEDIATE
  * actions (ingests, folds, rewrites) whose plans never appear in the
  * returned frame, so a listener captures every execution the query
  * body runs; the file ends with the returned frame's formatted plan.
  * One file per query: `<outDir>/<query>_<suffix>.txt`. */
object DumpExplain {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("explain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.locality.wait", "0")
      .config("spark.sql.codegen.hugeMethodLimit", "8000") // see Bench.scala
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        try plans.add((funcName, qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)))
        catch { case _: Throwable => }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    names.foreach { name =>
      plans.clear()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(2000) // listener bus is async: let captures drain
      val out = new StringBuilder
      out ++= s"# $name ($suffix) — every plan executed by the query body,\n"
      out ++= s"# then the returned frame's formatted plan. sf dir: $dir\n\n"
      val it = plans.iterator()
      var i = 0
      while (it.hasNext) {
        val (fn, p) = it.next()
        i += 1
        val nEx = "\\bExchange\\b".r.findAllIn(p).length
        out ++= s"## action $i ($fn) — $nEx Exchange\n\n"
        out ++= p.take(12000)
        out ++= "\n\n"
      }
      out ++= "## returned frame\n\n"
      out ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(12000)
      out ++= "\n"
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), out.result())
      // between-queries hygiene (the Bench pattern, minimal form)
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        graft.plans.AggStoreRegistry.clear()
        graft.queries.sweepScratch()
      } catch { case _: Throwable => }
    }
    spark.stop()
  }
}
