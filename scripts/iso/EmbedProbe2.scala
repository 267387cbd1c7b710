import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EmbedProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/r7_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$tag%-22s ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val vectors = spark.read.parquet(s"$dir/embeddings.parquet")
    def buckets = {
      val sigs = vectors.select(col("vec_id").as("id"), posexplode(array(
        (0 until 4).map(b => graft.functions.GraftColumns.srpBand(col("embedding"), b * 4, 4, 42L)): _*
      )).as(Seq("band", "sig")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("sig"))
      sigs.withColumn("bucket_n", count(lit(1)).over(w))
        .where(col("bucket_n") >= 2 && col("bucket_n") <= 4096)
        .groupBy(col("band"), col("sig"))
        .agg(sort_array(collect_list(col("id"))).as("members"))
    }
    def oldPairs = buckets
      .select(col("members"), posexplode(col("members")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "id_a")
      .select(col("id_a"),
        explode(slice(col("members"), col("i") + lit(2), size(col("members")))).as("id_b"))
      .where(col("id_a") < col("id_b"))
    def genPairs = buckets
      .select(graft.functions.GraftColumns.pairExplode(col("members")).as(Seq("id_a", "id_b")))
      .where(col("id_a") < col("id_b"))
    def sortDedup = genPairs
      .repartition(col("id_a"), col("id_b"))
      .sortWithinPartitions("id_a", "id_b")
      .as[(Long, Long)]
      .mapPartitions { it =>
        var lastA = Long.MinValue; var lastB = Long.MinValue
        it.filter { case (a, b) =>
          val keep = a != lastA || b != lastB
          if (keep) { lastA = a; lastB = b }
          keep
        }
      }.toDF("id_a", "id_b")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(genPairs) // warmup
    (1 to 2).foreach { _ =>
      time("old_pairs")(noop(oldPairs))
      time("gen_pairs")(noop(genPairs))
      time("gen_hash_distinct")(noop(genPairs.distinct()))
      time("gen_sort_dedup")(noop(sortDedup))
    }
    println("counts equal: " + (genPairs.distinct().count() == sortDedup.count()))
    spark.stop()
  }
}
