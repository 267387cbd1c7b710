package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** Canonical corpus-level digest of a query result — the gate that
  * closes the silent-drift window on rows-only `x_*` queries: a value
  * change inside a constant row count flips the digest even though the
  * driver's rows check still passes.
  *
  * Canonical form mirrors the driver's q_* compare: columns sorted by
  * name, every value cast to string (nulls -> U+2400), rows joined with
  * U+001F and SORTED, sha256 over the newline-joined block — so the
  * digest is independent of both column order and row order, and any
  * engine can recompute it from the parquet.
  *
  * Driver-side collect is by design: digesting is a gate-time operation
  * on gate-sized outputs (the largest x_ result at the gate tier is
  * ~31k small rows), not a corpus-scale operator.
  */
object Digest {
  def corpusSha(df: DataFrame): (Long, String) = {
    val cols = df.columns.sorted.map(c =>
      coalesce(col(c).cast("string"), lit("\u2400")))
    val rows = df.select(cols.toIndexedSeq: _*)
      .collect().map(_.toSeq.mkString("\u001f"))
    java.util.Arrays.sort(rows.asInstanceOf[Array[AnyRef]])
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.foreach { s => md.update(s.getBytes("UTF-8")); md.update('\n'.toByte) }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }
}
