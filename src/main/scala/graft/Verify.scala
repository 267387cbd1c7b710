package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json + digests.json, for the driver's DuckDB compare.
  *
  * Optional 3rd+ args select a query subset by exact name (used for the
  * big-tier sampled gates, e.g. sf10, where a handful of oracles are
  * super-linear on the DuckDB side); no extra args = all queries, the
  * driver's invocation shape. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val selected: Set[String] = args.drop(2).toSet
    val queries =
      if (selected.isEmpty) SparkEntry.queries
      else {
        val unknown = selected -- SparkEntry.queries.keySet
        require(unknown.isEmpty, s"unknown queries: ${unknown.toSeq.sorted.mkString(",")}")
        SparkEntry.queries.view.filterKeys(selected).toMap
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val digests = scala.collection.mutable.TreeMap[String, (Long, String)]()
    queries.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // canonical digest of the DURABLE bytes (what the driver reads)
        // for the rows-only x_* gates: the value-drift evidence the rows
        // check can't see, pinned in XDigestSpec. q_* queries are
        // value-hashed by the DuckDB oracle already, and digesting them
        // would collect multi-million-row results at the big tiers for
        // nothing — x_ outputs are gate-sized by construction.
        if (name.startsWith("x_"))
          digests(name) = Digest.corpusSha(spark.read.parquet(s"$outDir/$name"), name)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => queries.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/digests.json"), digests
      .map { case (k, (n, sha)) => s"""${q(k)}: {"rows":$n,"sha256":${q(sha)}}""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
