import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Decompose x_embed_neardup at a given sf dir: bucket window, pair
  * expansion, distinct, join+cosine. */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/r7_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$tag%-18s ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val vectors = spark.read.parquet(s"$dir/embeddings.parquet")
    def sigs = vectors.select(col("vec_id").as("id"), posexplode(array(
      (0 until 4).map(b => graft.functions.GraftColumns.srpBand(col("embedding"), b * 4, 4, 42L)): _*
    )).as(Seq("band", "sig")))
    def buckets = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("sig"))
      sigs.withColumn("bucket_n", count(lit(1)).over(w))
        .where(col("bucket_n") >= 2 && col("bucket_n") <= 4096)
        .groupBy(col("band"), col("sig"))
        .agg(sort_array(collect_list(col("id"))).as("members"))
    }
    def rawPairs = buckets
      .select(col("members"), posexplode(col("members")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "id_a")
      .select(col("id_a"),
        explode(slice(col("members"), col("i") + lit(2), size(col("members")))).as("id_b"))
      .where(col("id_a") < col("id_b"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmup
    noop(buckets)
    (1 to 2).foreach { r =>
      time("buckets")(noop(buckets))
      time("rawpairs")(noop(rawPairs))
      time("distinct")(noop(rawPairs.distinct()))
      time("full")(noop(graft.ops.Similarity.embeddingNearDups(vectors, dimCount = 64,
        threshold = 0.3, nPlanes = 4)))
    }
    spark.stop()
  }
}
