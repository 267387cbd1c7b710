object Plans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q_join_broadcast", "q_agg_lineitem", "q_minhash_sig",
      "q_ann_brute", "q_topk_per_group", "x_extract_spans")
    for (name <- interesting) {
      println(s"@@PLAN $name")
      println(graft.SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
