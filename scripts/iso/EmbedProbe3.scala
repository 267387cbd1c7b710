import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EmbedProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/r7_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vectors = spark.read.parquet(s"$dir/embeddings.parquet")
    def full = graft.ops.Similarity.embeddingNearDups(vectors, dimCount = 64,
      threshold = 0.3, nPlanes = 4)
    def simv = graft.ops.Dedup.simhashPairs(
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("doc_id", col("doc_id").cast("string")), maxDist = 16)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(full); noop(simv) // warmup
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime(); noop(full)
      val t1 = System.nanoTime(); noop(simv)
      val t2 = System.nanoTime()
      println(f"round $r embed_full=${(t1-t0)/1e9}%.3f simhash_full=${(t2-t1)/1e9}%.3f")
    }
    spark.stop()
  }
}
