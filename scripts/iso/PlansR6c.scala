import org.apache.spark.sql.SparkSession

/** Round-6 plan evidence for the substring-span dedup trio:
  * duplicateSpans = 3 hash exchanges (input spread, window-hash
  * partition, doc partition — the final groupBy reuses the doc
  * window's clustering); spread=false drops the first, leaving the
  * two data shuffles the algorithm needs. Printed pre-execution so
  * AQE's toString shows one plan section. */
object PlansR6c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for ((label, spread) <- Seq("spread=true (gate default)" -> true,
        "spread=false (cluster-scale source)" -> false)) {
      val df = graft.ops.Dedup.duplicateSpans(docs, k = 32, spread = spread)
      println(s"==== duplicateSpans $label")
      println(df.queryExecution.executedPlan.toString.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Window") || l.contains("Sort") ||
          l.contains("Scan") || l.contains("Generate") || l.contains("Aggregate") ||
          l.contains("Project") || l.contains("Filter"))
        .map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
