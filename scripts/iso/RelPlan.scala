object RelPlan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.io.SyntheticCorpus.docs(spark, 500, partitions = 8)
    val spans = graft.pipeline.ExtractRelational.spans(docs)
    val n = spans.count()
    val plan = spans.queryExecution.executedPlan.toString
    println("ROWS=" + n)
    println("HAS_BROADCAST=" + plan.contains("BroadcastHashJoin"))
    println("HAS_SMJ=" + plan.contains("SortMergeJoin"))
    println("HAS_AQE=" + plan.contains("AdaptiveSparkPlan"))
    println("HAS_INMEMORY=" + plan.contains("InMemory"))
    spark.stop()
  }
}
