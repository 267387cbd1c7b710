object NullSim {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                           array(CAST(1.0 AS FLOAT))) AS mismatch,
                cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS ok""").head()
    println("MISMATCH_IS_NULL=" + r.isNullAt(0))
    println("OK=" + r.getDouble(1))
    // near-dup over a corpus containing one truncated embedding: filtered, no crash
    import spark.implicits._
    val vecs = (Seq((0L, Array(1.0f, 1.0f)), (1L, Array(1.0f, 1.0f)), (2L, Array(1.0f))))
      .toDF("vec_id", "embedding")
    val nd = graft.ops.Similarity.embeddingNearDups(vecs, dimCount = 2, threshold = 0.9,
      nPlanes = 2, bands = 1)
    println("ND_ROWS=" + nd.collect().map(r => (r.getLong(0), r.getLong(1))).mkString(","))
    spark.stop()
  }
}
