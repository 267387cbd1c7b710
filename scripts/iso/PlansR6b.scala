import org.apache.spark.sql.SparkSession

/** Round-6 (second half) plan evidence for the image-geometry trio:
  * q_split_spread = one doc_id-hash exchange (renumber window) + the
  * gate's sort; q_frame_plan and the mask queries = narrow map-only
  * plans over the scan (no exchange before the gate sort). */
object PlansR6b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_split_spread", "q_figure_mask", "q_frame_plan", "x_figure_mask")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.count()
      println(s"==== $q")
      println(df.queryExecution.executedPlan.toString.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Sort") || l.contains("Window") ||
          l.contains("Scan") || l.contains("Generate") || l.contains("Project"))
        .map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
