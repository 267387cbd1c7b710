package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the extraction pipeline.
  *
  * Usage:
  *   spark-submit --class graft.Main <jar> extract   <inDir> <outDir> [buckets] [parallelism]
  *   spark-submit --class graft.Main <jar> synth     <nDocs> <outDir> [buckets] [parallelism]
  *   spark-submit --class graft.Main <jar> xml       <inDir> <outDir> [grouped]
 *                                                   [--header-levelN KEYWORDS]
 *   spark-submit --class graft.Main <jar> md        <inDir> <outDir>
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
        val par = rest.drop(1).headOption.map(_.toInt).getOrElse(4)
        // A corpus already in the bucket(doc_id) layout (Iceberg-style) is
        // consumed with per-bucket partition pruning — no staging pass and
        // no full rescans; a flat table is staged once by Checkpoint.run.
        // `par` buckets run concurrently so job tails overlap.
        val manifests =
          if (isBucketPartitioned(spark, inDir))
            graft.pipeline.Checkpoint.runPartitioned(spark, inDir, outDir,
              graft.io.TableIO.Cfg(nBuckets = buckets), parallelism = par)
          else {
            val docs = spark.read.parquet(inDir).as[graft.model.InputDoc]
            graft.pipeline.Checkpoint.run(docs, outDir, buckets, parallelism = par)
          }
        report(outDir, manifests, spark)
      case "synth" :: nDocs :: outDir :: rest =>
        val buckets = rest.headOption.map(_.toInt).getOrElse(64)
        val par = rest.drop(1).headOption.map(_.toInt).getOrElse(4)
        val docs = graft.io.SyntheticCorpus.docs(spark, nDocs.toLong)
        val manifests = graft.pipeline.Checkpoint.run(docs, outDir, buckets, parallelism = par)
        report(outDir, manifests, spark)
      case "xml" :: inDir :: outDir :: rest =>
        // formatter sink: one reference-parity book.xml string per doc;
        // "grouped" applies the --group-pages hierarchy transform, with
        // reference-rejected docs quarantined as error rows.
        // --header-levelN KEYWORDS (pipe-separated) mirrors the reference
        // CLI (book_converter/cli.py:66-73) and threads a
        // HeaderLevelConfig into group_pages_by_toc.
        val (config, positionals) = parseXmlOpts(rest)
        val grouped = positionals.contains("grouped")
        val docs =
          if (isBucketPartitioned(spark, inDir))
            graft.io.TableIO.readDocs(spark, inDir)
          else spark.read.parquet(inDir).as[graft.model.InputDoc]
        val out =
          if (!grouped)
            graft.sink.XmlBuilder.xml(docs).toDF("doc_id", "xml")
              .withColumn("error", org.apache.spark.sql.functions.lit(""))
          else docs.mapPartitions(_.map { d =>
            scala.util.Try(graft.sink.GroupedXml.buildGroupedXml(d, config = config)) match {
              case scala.util.Success(x) => (d.doc_id, x, "")
              case scala.util.Failure(e) =>
                (d.doc_id, "", e.getClass.getSimpleName + ": " +
                  Option(e.getMessage).getOrElse(""))
            }
          }).toDF("doc_id", "xml", "error")
        // observe() rides the write job — no second scan of the output
        import org.apache.spark.sql.functions.{count, lit, sum, when, col}
        val obs = new org.apache.spark.sql.Observation("xml_metrics")
        out.observe(obs, count(lit(1)).as("docs"),
            sum(when(col("error") =!= "", 1L).otherwise(0L)).as("errors"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(outDir)
        val m = obs.get
        val errs = Option(m("errors")).map(_.asInstanceOf[Long]).getOrElse(0L)
        println(s"""{"docs":${m("docs")},"errors":$errs,"out":"$outDir"}""")
      case "md" :: inDir :: outDir :: Nil =>
        // consolidate sink (src/cli/consolidate.py step): one
        // reference-parity book.txt + book.md per doc; zero-page docs
        // (the reference raises) are quarantined as error rows
        val docs =
          if (isBucketPartitioned(spark, inDir))
            graft.io.TableIO.readDocs(spark, inDir)
          else spark.read.parquet(inDir).as[graft.model.InputDoc]
        import org.apache.spark.sql.functions.{count, lit, sum, when, col}
        val out = graft.sink.Consolidate.books(docs)
          .toDF("doc_id", "book_txt", "book_md", "error")
        val obs = new org.apache.spark.sql.Observation("md_metrics")
        out.observe(obs, count(lit(1)).as("docs"),
            sum(when(col("error") =!= "", 1L).otherwise(0L)).as("errors"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(outDir)
        val m = obs.get
        val errs = Option(m("errors")).map(_.asInstanceOf[Long]).getOrElse(0L)
        println(s"""{"docs":${m("docs")},"errors":$errs,"out":"$outDir"}""")
      case other =>
        System.err.println(s"unknown args: $other (want: extract <in> <out> [buckets] | " +
          "synth <nDocs> <out> [buckets] | " +
          "xml <in> <out> [grouped] [--header-levelN KEYWORDS] | md <in> <out>)")
        sys.exit(2)
    }
    spark.stop()
  }

  /** Parse xml-mode options: --header-levelN consumes its value (so a
    * keyword value can't be misread as a positional), a repeated flag
    * takes the LAST occurrence, and a flag missing its value exits 2 —
    * argparse semantics (cli.py:66-73). Keywords are pipe-separated,
    * stripped, empties dropped (HeaderLevelConfig.from_cli_args,
    * models.py:286-313); config is None when no level was given. */
  private def parseXmlOpts(rest: List[String])
      : (Option[graft.group.Sections.HeaderLevelConfig], List[String]) = {
    val flags = (1 to 5).map(n => s"--header-level$n").toSet
    val values = scala.collection.mutable.Map[String, String]()
    val positionals = List.newBuilder[String]
    var r = rest
    while (r.nonEmpty) r match {
      case flag :: value :: tail if flags(flag) =>
        values(flag) = value // last occurrence wins
        r = tail
      case flag :: Nil if flags(flag) =>
        System.err.println(s"error: argument $flag: expected one argument")
        sys.exit(2)
      case other :: tail =>
        positionals += other
        r = tail
      case Nil => ()
    }
    def level(n: Int): Vector[String] =
      values.get(s"--header-level$n")
        .map(_.split('|').toVector.map(graft.text.Py.strip).filter(_.nonEmpty))
        .getOrElse(Vector.empty)
    val cfg = graft.group.Sections.HeaderLevelConfig(
      level(1), level(2), level(3), level(4), level(5))
    (if (cfg.hasAnyConfig) Some(cfg) else None, positionals.result())
  }

  private def isBucketPartitioned(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("bucket="))
  }

  private def report(outDir: String, ran: Vector[graft.pipeline.Checkpoint.BucketManifest],
      spark: SparkSession): Unit = {
    val all = graft.pipeline.Checkpoint.readManifests(spark, outDir)
    println(s"""{"buckets_total":${all.size},"buckets_this_run":${ran.size},""" +
      s""""docs":${all.map(_.nDocs).sum},"spans":${all.map(_.spanCount).sum},""" +
      s""""chars":${all.map(_.charCount).sum},"errors":${all.map(_.errorCount).sum}}""")
  }
}
