object Plans2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.ExplainMode

    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val nd = graft.ops.Similarity.embeddingNearDups(emb, dimCount = 64, threshold = 0.3, nPlanes = 4)
    nd.count()
    println("==== x_embed_neardup ====")
    println(nd.queryExecution.explainString(ExplainMode.fromString("formatted")).take(4000))

    val docs = graft.io.SyntheticCorpus.docs(spark, 200, partitions = 8)
    val rel = graft.pipeline.ExtractRelational.spans(docs)
    rel.count()
    println("==== x_extract_relational ====")
    println(rel.queryExecution.explainString(ExplainMode.fromString("formatted")).take(4000))

    // checkpoint pruned per-bucket read
    val dir = java.nio.file.Files.createTempDirectory("plans_ckpt").toString
    graft.io.TableIO.writeDocs(docs, dir, graft.io.TableIO.Cfg(nBuckets = 8))
    val pruned = graft.io.TableIO.readDocs(spark, dir, graft.io.TableIO.Cfg(nBuckets = 8), Some(Seq(3)))
    pruned.count()
    println("==== checkpoint bucket read ====")
    println(pruned.queryExecution.explainString(ExplainMode.fromString("formatted")).take(2500))
    spark.stop()
  }
}
