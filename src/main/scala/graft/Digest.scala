package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** Canonical corpus-level digest of a query result — the gate that
  * closes the silent-drift window on rows-only `x_*` queries: a value
  * change inside a constant row count flips the digest even though the
  * driver's rows check still passes.
  *
  * Canonical form (engine-neutral, exactly reproducible from the
  * parquet): a PREAMBLE carrying the digest's identity — the caller's
  * `label` (the query name at the gates) then the column names in
  * sorted order, each framed as
  * `<decimal byte length of UTF-8 encoding>:<value>`, the preamble
  * closed with '\n'; then the rows: columns sorted by name; every value
  * cast to string (nulls -> U+2400); each row serialized as the
  * concatenation of the same length-prefixed frames per column (length
  * prefixes make the framing unambiguous — no separator to escape);
  * rows sorted by their UTF-8 bytes (unsigned lexicographic ==
  * code-point order, NOT Java's UTF-16 code-unit order, which disagrees
  * for supplementary-plane chars); sha256 over preamble + sorted rows,
  * each row terminated with '\n'.
  *
  * The preamble exists because values alone cannot distinguish two
  * value-identical outputs: without it, a query regressing into ANOTHER
  * query's identical-valued result, or a column silently renamed, kept
  * the pinned digest green (x_extract_relational and x_extract_spans
  * pinned the same sha under v2). Schema identity and query identity
  * now participate (digest v3; v2 pins do not carry forward — re-pin
  * from Verify digests.json).
  *
  * Driver-side collect is by design: digesting is a gate-time operation
  * on gate-sized outputs (the largest x_ result at the gate tier is
  * ~31k small rows), not a corpus-scale operator.
  */
object Digest {
  private def frame(v: String): Array[Byte] = {
    val bytes = v.getBytes("UTF-8")
    s"${bytes.length}:".getBytes("UTF-8") ++ bytes
  }

  def corpusSha(df: DataFrame, label: String = ""): (Long, String) = {
    val names = df.columns.sorted
    val cols = names.map(c =>
      coalesce(col(c).cast("string"), lit("␀")))
    val rows: Array[Array[Byte]] = df.select(cols.toIndexedSeq: _*)
      .collect().map { r =>
        val sb = new StringBuilder
        var i = 0
        while (i < r.length) {
          val v = r.getString(i)
          sb.append(v.getBytes("UTF-8").length).append(':').append(v)
          i += 1
        }
        sb.result().getBytes("UTF-8")
      }
    java.util.Arrays.sort(rows, java.util.Arrays.compareUnsigned(_: Array[Byte], _: Array[Byte]))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(frame(label))
    names.foreach(n => md.update(frame(n)))
    md.update('\n'.toByte)
    rows.foreach { b => md.update(b); md.update('\n'.toByte) }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }
}
