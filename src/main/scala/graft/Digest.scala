package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** Canonical corpus-level digest of a query result — the gate that
  * closes the silent-drift window on rows-only `x_*` queries: a value
  * change inside a constant row count flips the digest even though the
  * driver's rows check still passes.
  *
  * Canonical form (engine-neutral, exactly reproducible from the
  * parquet): columns sorted by name; every value cast to string (nulls
  * -> U+2400); each row serialized as the concatenation of
  * `<decimal byte length of value's UTF-8 encoding>:<value>` per column
  * (length prefixes make the framing unambiguous — no separator to
  * escape); rows sorted by their UTF-8 bytes (unsigned lexicographic ==
  * code-point order, NOT Java's UTF-16 code-unit order, which disagrees
  * for supplementary-plane chars); sha256 over the rows joined with
  * '\n'.
  *
  * Driver-side collect is by design: digesting is a gate-time operation
  * on gate-sized outputs (the largest x_ result at the gate tier is
  * ~31k small rows), not a corpus-scale operator.
  */
object Digest {
  def corpusSha(df: DataFrame): (Long, String) = {
    val cols = df.columns.sorted.map(c =>
      coalesce(col(c).cast("string"), lit("\u2400")))
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
    rows.foreach { b => md.update(b); md.update('\n'.toByte) }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }
}
