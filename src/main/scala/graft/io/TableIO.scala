package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.InputDoc

/** Format seam for the corpus table (SURVEY §7.0): production reads the
  * Iceberg table (`format = "iceberg"`, catalog path); the sandbox has no
  * Iceberg runtime jar, so tests/bench use Parquet with the identical
  * schema plus a `bucket` partition column emulating the Iceberg
  * `bucket(doc_id)` partition transform. Switching is a config flip —
  * no code change in the pipeline.
  */
object TableIO {

  final case class Cfg(format: String = "parquet", nBuckets: Int = 64)

  /** Write the corpus partitioned by bucket(doc_id) — the layout the
    * checkpointed extraction consumes partition-by-partition. */
  def writeDocs(docs: Dataset[InputDoc], path: String, cfg: Cfg = Cfg()): Unit =
    docs.toDF()
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(cfg.nBuckets)).cast("int"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .format(cfg.format)
      .save(path)

  /** Project a corpus DataFrame down to what extraction consumes —
    * (doc_id, spans.text, spans.offset) — so NESTED-SCHEMA PRUNING
    * reaches the scan (ReadSchema drops kind/media_ref). Direct
    * `spans.field` access is load-bearing here: wrapping the array in
    * transform() blocks the pruning. Shared by Checkpoint and Scaling. */
  def pruneLines(corpus: DataFrame): Dataset[(String, Array[String], Array[Int])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .select(col("doc_id"), col("spans.text").as("texts"), col("spans.offset").as("offsets"))
      .as[(String, Array[String], Array[Int])]
  }

  /** Read the corpus; `bucketFilter` prunes partitions at the source
    * (partition pruning — verified in the plan as PartitionFilters). */
  def readDocs(spark: SparkSession, path: String, cfg: Cfg = Cfg(),
      bucketFilter: Option[Seq[Int]] = None): Dataset[InputDoc] = {
    import spark.implicits._
    val df: DataFrame = spark.read.format(cfg.format).load(path)
    val pruned = bucketFilter match {
      case Some(bs) => df.where(col("bucket").isin(bs: _*))
      case None     => df
    }
    pruned.select(col("doc_id"), col("spans")).as[InputDoc]
  }
}
