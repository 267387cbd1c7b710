object MkCorpus {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.io.TableIO.writeDocs(graft.io.SyntheticCorpus.docs(spark, 100, partitions = 8),
      "/tmp/mismatch_corpus", graft.io.TableIO.Cfg(nBuckets = 16))
    spark.stop()
  }
}
