import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-5 plan evidence: (1) ivfQuery over the persisted
  * cell-partitioned corpus — dynamic partition pruning on `cell`;
  * (2) the restructured rare-trigram score — prefiltered model join +
  * join-free n_tri. Run:
  *   sbt 'set Compile/unmanagedSourceDirectories += file("scripts/iso")' \
  *       'runMain PlansR5 /root/testdata/sf0.01'
  */
object PlansR5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = graft.ops.Similarity.IvfModel.fit(emb)
    val base = java.nio.file.Files.createTempDirectory("plans_r5").toString
    graft.ops.Similarity.ivfAssign(emb, model)
      .write.partitionBy("cell").parquet(s"$base/assigned")
    val q = graft.ops.Similarity.ivfQuery(
      spark.read.parquet(s"$base/assigned"), model, emb.where(col("vec_id") < 10), k = 5)
    q.collect()
    println("==== ivfQuery over persisted cell-partitioned corpus ====")
    println(q.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan") || l.contains("Join") || l.contains("Exchange") ||
        l.contains("dynamicpruning") || l.contains("PartitionFilters"))
      .mkString("\n"))

    val rare = graft.ops.TextAnalytics.rareTrigramScoresScaleFree(
      spark.read.parquet(s"$dir/documents.parquet"))
    rare.collect()
    println("==== rareTrigramScoresScaleFree ====")
    rare.explain("formatted")
    spark.stop()
  }
}
