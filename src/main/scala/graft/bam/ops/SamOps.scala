package graft.bam.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SAM text-format source (S3): `spark.read.text` + header filter + a
  * columnar parse — the reference's loadSam
  * (load/.../CanLoadBam.scala:41-69) with the header broadcast replaced by
  * a literal contig→index map resolved at plan time.
  *
  * Text SAM is line-oriented, so Spark's text source already gives
  * splittable parallel ingest; everything below is narrow codegen'd
  * column work.
  */
object SamOps {

  /** Parse the @SQ header lines driver-side (tiny) for the contig dict. */
  def readContigs(spark: SparkSession, path: String): Seq[(String, Int)] = {
    spark.read.text(path)
      .filter(col("value").startsWith("@SQ"))
      .collect()
      .map { r =>
        val fields = r.getString(0).split("\t")
        val sn = fields.find(_.startsWith("SN:")).get.drop(3)
        val ln = fields.find(_.startsWith("LN:")).get.drop(3).toInt
        (sn, ln)
      }.toSeq
  }

  /** Load SAM alignment lines into the engine's record schema (the
    * BAM-source column subset that text SAM carries). */
  def loadSam(spark: SparkSession, path: String): DataFrame = {
    val contigs = readContigs(spark, path)
    val refIdxExpr = contigs.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, ((name, _), i)) =>
        when(col("rname") === name, lit(i)).otherwise(acc)
    }
    val f = split(col("value"), "\t")
    spark.read.text(path)
      .filter(!col("value").startsWith("@")) // P1 header-line filter
      .select(
        element_at(f, 1).as("readName"),
        element_at(f, 2).cast("int").as("flags"),
        element_at(f, 3).as("rname"),
        (element_at(f, 4).cast("int") - 1).as("pos"), // SAM 1-based -> 0-based
        element_at(f, 5).cast("int").as("mapq"),
        element_at(f, 6).as("cigarStr"),
        element_at(f, 10).as("seq"))
      .withColumn("refIdx", refIdxExpr)
      .withColumn("contig", when(col("rname") === "*", null).otherwise(col("rname")))
      .drop("rname")
  }
}
