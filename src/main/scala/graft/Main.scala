package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the extraction pipeline.
  *
  * Usage:
  *   spark-submit --class graft.Main <jar> extract   <inDir> <outDir> [buckets] [parallelism]
  *                                                   [--format FMT] [--metrics MODE]
  *   spark-submit --class graft.Main <jar> synth     <nDocs> <outDir> [buckets] [parallelism]
  *                                                   [--format FMT] [--metrics MODE]
  *   spark-submit --class graft.Main <jar> xml       <inDir> <outDir> [grouped]
  *                                                   [--header-levelN KEYWORDS]
  *                                                   [--running-head-threshold RATIO]
  *                                                   [--format FMT]
  *   spark-submit --class graft.Main <jar> md        <inDir> <outDir> [--format FMT]
  *
  * `extract` reads an input table with the input_hint shape
  * (doc_id string, spans array<struct<kind,text,media_ref,offset>>) from
  * parquet/Iceberg and runs the checkpointed extraction; `synth`
  * generates the deterministic corpus first (for cluster rehearsal).
  * Both resume idempotently: rerunning after a kill skips committed
  * buckets (see pipeline/Checkpoint).
  *
  * `--format` (default parquet) is the [[graft.io.TableIO]] format seam:
  * it selects the DataSource format for every corpus-table read AND for
  * the staged bucket layout `synth`/`extract` write — `orc` is
  * round-trip-proven in TableIOSpec; an Iceberg runtime would slot in the
  * same way. Span/error/sink OUTPUT stays parquet: that is the
  * downstream `spark.read.parquet(outDir)` contract, not the corpus
  * table. `--running-head-threshold` (xml mode, default 0.5) mirrors the
  * reference CLI (book_converter/cli.py:49-56).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    import spark.implicits._

    try args.toList match {
      case "extract" :: rest0 =>
        // options may appear anywhere after the mode (argparse parity)
        val (opts, pos0) = parseOpts(rest0, Set("--format", "--metrics"))
        val (inDir, outDir, pos) = twoRequired("extract", "inDir, outDir", pos0)
        val fmt = opts.getOrElse("--format", "parquet")
        val buckets = pos.headOption.map(parseIntArg("buckets")).getOrElse(256)
        val par = pos.drop(1).headOption.map(parseIntArg("parallelism")).getOrElse(4)
        if (pos.length > 2)
          throw CliError(s"error: unrecognized arguments: ${pos.drop(2).mkString(" ")}")
        // A corpus already in the bucket(doc_id) layout (Iceberg-style) is
        // consumed with per-bucket partition pruning — no staging pass and
        // no full rescans; a flat table is staged once by Checkpoint.run.
        // `par` buckets run concurrently so job tails overlap.
        val manifests =
          if (isBucketPartitioned(spark, inDir))
            graft.pipeline.Checkpoint.runPartitioned(spark, inDir, outDir,
              graft.io.TableIO.Cfg(format = fmt, nBuckets = buckets), parallelism = par,
              metricsMode = metricsMode(opts))
          else {
            val docs = spark.read.format(fmt).load(inDir).as[graft.model.InputDoc]
            graft.pipeline.Checkpoint.run(docs, outDir, buckets, format = fmt,
              parallelism = par, metricsMode = metricsMode(opts))
          }
        report(outDir, manifests, spark)
      case "synth" :: rest0 =>
        val (opts, pos0) = parseOpts(rest0, Set("--format", "--metrics"))
        val (nDocs, outDir, pos) = twoRequired("synth", "nDocs, outDir", pos0)
        val fmt = opts.getOrElse("--format", "parquet")
        val buckets = pos.headOption.map(parseIntArg("buckets")).getOrElse(64)
        val par = pos.drop(1).headOption.map(parseIntArg("parallelism")).getOrElse(4)
        if (pos.length > 2)
          throw CliError(s"error: unrecognized arguments: ${pos.drop(2).mkString(" ")}")
        val docs = graft.io.SyntheticCorpus.docs(spark, parseLongArg("nDocs")(nDocs))
        val manifests = graft.pipeline.Checkpoint.run(docs, outDir, buckets, format = fmt,
          parallelism = par, metricsMode = metricsMode(opts))
        report(outDir, manifests, spark)
      case "xml" :: rest0 =>
        // formatter sink: one reference-parity book.xml string per doc;
        // "grouped" applies the --group-pages hierarchy transform, with
        // reference-rejected docs quarantined as error rows.
        // --header-levelN KEYWORDS (pipe-separated) mirrors the reference
        // CLI (book_converter/cli.py:66-73) and threads a
        // HeaderLevelConfig into group_pages_by_toc;
        // --running-head-threshold RATIO mirrors cli.py:49-56.
        val (opts, pos0) = parseOpts(rest0, xmlFlags)
        val (inDir, outDir, positionals) = twoRequired("xml", "inDir, outDir", pos0)
        val config = headerConfig(opts)
        val threshold = opts.get("--running-head-threshold")
          .map(parseFloatArg("--running-head-threshold")).getOrElse(0.5)
        val fmt = opts.getOrElse("--format", "parquet")
        val grouped = positionals.contains("grouped")
        // argparse parity: 'grouped' is the only legal extra positional —
        // a typo must not silently produce ungrouped output
        val junk = positionals.filterNot(_ == "grouped")
        if (junk.nonEmpty)
          throw CliError(s"error: unrecognized arguments: ${junk.mkString(" ")}")
        val docs = readCorpus(spark, inDir, fmt)
        val out =
          if (!grouped)
            graft.sink.XmlBuilder.xml(docs, threshold).toDF("doc_id", "xml")
              .withColumn("error", org.apache.spark.sql.functions.lit(""))
          else docs.mapPartitions(_.map { d =>
            scala.util.Try(graft.sink.GroupedXml.buildGroupedXml(d, threshold, config)) match {
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
      case "md" :: rest0 =>
        // consolidate sink (src/cli/consolidate.py step): one
        // reference-parity book.txt + book.md per doc; zero-page docs
        // (the reference raises) are quarantined as error rows
        val (opts, pos0) = parseOpts(rest0, Set("--format"))
        val (inDir, outDir, positionals) = twoRequired("md", "inDir, outDir", pos0)
        if (positionals.nonEmpty)
          throw CliError(s"error: unrecognized arguments: ${positionals.mkString(" ")}")
        val docs = readCorpus(spark, inDir, opts.getOrElse("--format", "parquet"))
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
        System.err.println(s"unknown args: $other (want: extract <in> <out> [buckets] " +
          "[parallelism] [--format FMT] [--metrics MODE] | synth <nDocs> <out> [buckets] " +
          "[parallelism] [--format FMT] [--metrics MODE] | xml <in> <out> [grouped] " +
          "[--header-levelN KEYWORDS] [--running-head-threshold RATIO] [--format FMT] | " +
          "md <in> <out> [--format FMT])")
        sys.exit(2)
    } catch {
      case CliError(msg) =>
        System.err.println(msg)
        sys.exit(2)
    }
    spark.stop()
  }

  /** argparse-style usage error: main prints the message and exits 2. */
  final case class CliError(msg: String) extends RuntimeException(msg)

  private[graft] val xmlFlags: Set[String] =
    (1 to 5).map(n => s"--header-level$n").toSet ++
      Set("--running-head-threshold", "--format")

  /** Parse `--flag VALUE` options: each flag consumes exactly one value
    * (so a value can't be misread as a positional), a repeated flag takes
    * the LAST occurrence, a flag missing its value errors (exit 2 from
    * main), and an option-like value is rejected (argparse refuses
    * option-like values with 'expected one argument' — cli.py:66-73).
    * Unknown `--` tokens error like argparse's 'unrecognized arguments'. */
  private[graft] def parseOpts(rest: List[String], allowed: Set[String])
      : (Map[String, String], List[String]) = {
    val values = scala.collection.mutable.Map[String, String]()
    val positionals = List.newBuilder[String]
    var r = rest
    while (r.nonEmpty) r match {
      case flag :: value :: tail if allowed(flag) && !value.startsWith("--") =>
        values(flag) = value // last occurrence wins
        r = tail
      case flag :: _ if allowed(flag) =>
        // at end of args, or the next token is itself option-like:
        // argparse errors rather than consuming an option as a value
        throw CliError(s"error: argument $flag: expected one argument")
      case flag :: _ if flag.startsWith("--") =>
        throw CliError(s"error: unrecognized arguments: $flag")
      case other :: tail =>
        positionals += other
        r = tail
      case Nil => ()
    }
    (values.toMap, positionals.result())
  }

  /** --header-levelN keywords -> HeaderLevelConfig: pipe-separated,
    * stripped, empties dropped (HeaderLevelConfig.from_cli_args,
    * models.py:286-313); None when no level was given. */
  private[graft] def headerConfig(opts: Map[String, String])
      : Option[graft.group.Sections.HeaderLevelConfig] = {
    def level(n: Int): Vector[String] =
      opts.get(s"--header-level$n")
        .map(_.split('|').toVector.map(graft.text.Py.strip).filter(_.nonEmpty))
        .getOrElse(Vector.empty)
    val cfg = graft.group.Sections.HeaderLevelConfig(
      level(1), level(2), level(3), level(4), level(5))
    if (cfg.hasAnyConfig) Some(cfg) else None
  }

  /** --metrics observe|readback (default observe; see
    * [[graft.pipeline.Checkpoint.MetricsMode]] and the BASELINE.md
    * measurement that picked the default). */
  private[graft] def metricsMode(opts: Map[String, String])
      : graft.pipeline.Checkpoint.MetricsMode =
    opts.get("--metrics") match {
      case None | Some("observe") => graft.pipeline.Checkpoint.MetricsObserve
      case Some("readback")       => graft.pipeline.Checkpoint.MetricsReadBack
      case Some(v) =>
        throw CliError(s"error: argument --metrics: invalid choice: '$v' " +
          "(choose from 'observe', 'readback')")
    }

  /** argparse `type=float` semantics: a non-float value errors (exit 2). */
  private[graft] def parseFloatArg(flag: String)(v: String): Double =
    v.toDoubleOption.getOrElse(
      throw CliError(s"error: argument $flag: invalid float value: '$v'"))

  /** argparse `type=int` semantics: a non-int value errors (exit 2). */
  private[graft] def parseIntArg(flag: String)(v: String): Int =
    v.toIntOption.getOrElse(
      throw CliError(s"error: argument $flag: invalid int value: '$v'"))

  /** Long-range count arguments (nDocs can exceed 2^31-1 for large
    * rehearsal corpora; buckets/parallelism stay Int). */
  private[graft] def parseLongArg(flag: String)(v: String): Long =
    v.toLongOption.getOrElse(
      throw CliError(s"error: argument $flag: invalid int value: '$v'"))

  /** The two required positionals of every mode; missing ones error like
    * argparse's 'the following arguments are required'. */
  private[graft] def twoRequired(mode: String, names: String, pos: List[String])
      : (String, String, List[String]) = pos match {
    case a :: b :: tail => (a, b, tail)
    case _ => throw CliError(s"error: $mode: the following arguments are required: $names")
  }

  /** Corpus read through the TableIO format seam: a bucket-partitioned
    * layout goes through TableIO.readDocs (partition pruning preserved);
    * a flat table is read with the same DataSource format. */
  private def readCorpus(spark: SparkSession, inDir: String, fmt: String)
      : org.apache.spark.sql.Dataset[graft.model.InputDoc] =
    if (isBucketPartitioned(spark, inDir))
      graft.io.TableIO.readDocs(spark, inDir, graft.io.TableIO.Cfg(format = fmt))
    else
      spark.read.format(fmt).load(inDir)
        .as[graft.model.InputDoc](org.apache.spark.sql.Encoders.product[graft.model.InputDoc])

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
