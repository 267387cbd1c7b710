object VerifySim {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // happy path through the injected SQL surface
    println("COS=" + spark.sql(
      "SELECT cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head().getDouble(0))
    // wrong element type -> analysis error, not a runtime crash
    try {
      spark.sql("SELECT cosine_sim(array(1.0D), array(2.0D))").head()
      println("PROBE_TYPE=NO_ERROR")
    } catch { case e: Exception => println("PROBE_TYPE=" + e.getMessage.linesIterator.next()) }
    // wrong arity
    try {
      spark.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT)))").head()
      println("PROBE_ARITY=NO_ERROR")
    } catch { case e: Exception => println("PROBE_ARITY=" + e.getMessage.linesIterator.next()) }
    // plan: near-dup pairwise scoring must be codegen cosine_sim, no interpreted HOFs
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val nd = graft.ops.Similarity.embeddingNearDups(emb, dimCount = 64, threshold = 0.3, nPlanes = 4)
    val plan = nd.queryExecution.executedPlan.toString
    println("PLAN_HAS_COSINE=" + plan.contains("cosine_sim"))
    println("PLAN_HAS_INTERPRETED_AGG=" + (plan.contains("aggregate(") || plan.contains("zip_with")))
    println("ND_ROWS=" + nd.count())
    spark.stop()
  }
}
