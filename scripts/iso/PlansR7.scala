import org.apache.spark.sql.SparkSession

/** Round-7 plan evidence dumper: writes `.explain("formatted")` output
  * for the named SparkEntry queries to plans/r07/<query>_<suffix>.txt.
  * Run BEFORE and AFTER an optimization with the matching suffix:
  *   sbt 'set Compile/unmanagedSourceDirectories += file("scripts/iso")' \
  *       'runMain PlansR7 before q_lsh_jaccard q_dup_spans ...'
  * Uses the same session shape as Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE on) so plan shapes match the bench.
  */
object PlansR7 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = args.drop(1).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get("plans/r07")
    java.nio.file.Files.createDirectories(out)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(out.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote ${name}_$suffix.txt (${txt.linesIterator.count(_.contains("Exchange"))} Exchange mentions)")
    }
    spark.stop()
  }
}
