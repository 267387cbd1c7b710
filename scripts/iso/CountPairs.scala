import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CountPairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .withColumn("doc_id", col("doc_id").cast("string"))
    val blocks = graft.ops.Dedup.simhashBlocks(docs)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("blk"), col("key"))
    val raw = blocks.withColumn("bucket_n", count(lit(1)).over(w))
      .where(col("bucket_n") >= 2 && col("bucket_n") <= 1000)
      .groupBy(col("blk"), col("key"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("members"))
      .select(col("members"), posexplode(col("members")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "a")
      .select(col("a"),
        explode(slice(col("members"), col("i") + lit(2), size(col("members")))).as("b"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .where(col("doc_a") < col("doc_b"))
    println("RAW_PAIRS=" + raw.count())
    println("SURVIVORS=" + raw.withColumn("hamming",
      bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= 16).count())
    // embed candidates
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val sigs = emb.select(col("vec_id").as("id"), posexplode(array(
      (0 until 4).map(b => graft.functions.GraftColumns.srpBand(col("embedding"), b * 4, 4, 42L)): _*
    )).as(Seq("band", "sig")))
    val w2 = org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("sig"))
    val bkt = sigs.withColumn("bucket_n", count(lit(1)).over(w2))
      .where(col("bucket_n") >= 2 && col("bucket_n") <= 4096)
      .groupBy(col("band"), col("sig"))
      .agg(sort_array(collect_list(col("id"))).as("members"))
    println("EMB_RAWPAIRS=" + bkt.select(posexplode(col("members")), col("members"))
      .select(explode(slice(col("members"), col("pos") + lit(2), size(col("members")))).as("b"), col("col").as("a"))
      .where(col("a") < col("b")).count())
    spark.stop()
  }
}
