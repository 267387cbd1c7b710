object RelPlan2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.adaptive.enabled", "false")                 // probe: no AQE
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")          // probe: broadcast banned
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.io.SyntheticCorpus.docs(spark, 300, partitions = 8)
    val spans = graft.pipeline.ExtractRelational.spans(docs)
    val plan = spans.queryExecution.executedPlan.toString
    println("NOAQE_ROWS=" + spans.count())
    println("NOAQE_HAS_SMJ=" + plan.contains("SortMergeJoin"))
    println("NOAQE_HAS_BROADCAST=" + plan.contains("BroadcastHashJoin"))
    // equivalence with the fused path under the shuffled-join plan
    val fused = graft.pipeline.Extract.spans(docs).toDF()
    println("EQ_FUSED=" + (fused.except(spans.toDF()).isEmpty && spans.toDF().except(fused).isEmpty))
    // Skew helper: docs spread over target partitions, extraction unchanged
    val df = graft.pipeline.Skew.repartitionByDocHash(docs.toDF(), 16)
    println("SKEW_PARTS=" + df.rdd.getNumPartitions)
    import spark.implicits._
    val redocs = df.as[graft.model.InputDoc]
    println("SKEW_EQ=" + (graft.pipeline.Extract.spans(redocs).toDF().except(fused).isEmpty))
    spark.stop()
  }
}
