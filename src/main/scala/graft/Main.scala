package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the extraction pipeline.
  *
  * Usage:
  *   spark-submit --class graft.Main <jar> extract   <inDir> <outDir> [buckets]
  *   spark-submit --class graft.Main <jar> synth     <nDocs> <outDir> [buckets]
  *
  * `extract` reads an input table with the input_hint shape
  * (doc_id string, spans array<struct<kind,text,media_ref,offset>>) from
  * parquet/Iceberg and runs the checkpointed extraction; `synth`
  * generates the deterministic corpus first (for cluster rehearsal).
  * Both resume idempotently: rerunning after a kill skips committed
  * buckets (see pipeline/Checkpoint).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    import spark.implicits._

    args.toList match {
      case "extract" :: inDir :: outDir :: rest =>
        val buckets = rest.headOption.map(_.toInt).getOrElse(256)
        val docs = spark.read.parquet(inDir).as[graft.model.InputDoc]
        val manifests = graft.pipeline.Checkpoint.run(docs, outDir, buckets)
        report(outDir, manifests, spark)
      case "synth" :: nDocs :: outDir :: rest =>
        val buckets = rest.headOption.map(_.toInt).getOrElse(64)
        val docs = graft.io.SyntheticCorpus.docs(spark, nDocs.toLong)
        val manifests = graft.pipeline.Checkpoint.run(docs, outDir, buckets)
        report(outDir, manifests, spark)
      case other =>
        System.err.println(s"unknown args: $other (want: extract|synth ...)")
        sys.exit(2)
    }
    spark.stop()
  }

  private def report(outDir: String, ran: Vector[graft.pipeline.Checkpoint.BucketManifest],
      spark: SparkSession): Unit = {
    val all = graft.pipeline.Checkpoint.readManifests(spark, outDir)
    println(s"""{"buckets_total":${all.size},"buckets_this_run":${ran.size},""" +
      s""""docs":${all.map(_.nDocs).sum},"spans":${all.map(_.spanCount).sum},""" +
      s""""chars":${all.map(_.charCount).sum}}""")
  }
}
