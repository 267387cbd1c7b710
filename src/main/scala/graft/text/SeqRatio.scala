package graft.text

import scala.collection.mutable

/** Faithful Scala port of CPython `difflib.SequenceMatcher`
  * (isjunk=None, autojunk=True) — the similarity primitive the reference
  * uses for TOC fuzzy matching (src/book_converter/heading_matcher.py:206),
  * whole-page voting (src/ocr_ensemble/voting.py:143-149) and ROVER char
  * alignment (src/rover/alignment.py:104).
  *
  * Operates on UNICODE CODE POINTS, not UTF-16 units: Python strings are
  * code-point sequences, so lengths, match indices, and the autojunk
  * length threshold (len(b) > 199) all count code points. With non-BMP
  * characters (𠮷, emoji) a UTF-16 port diverges — ratios shift and the
  * autojunk heuristic can flip on/off (verified against difflib).
  *
  * Implements the published Ratcliff/Obershelp variant from the CPython
  * standard library (public source), including the autojunk "popular
  * element" heuristic (b longer than 199 elements: elements occurring
  * more than 1% are excluded from match seeding but still joinable by
  * extension — observable in opcodes, so required for fixture parity).
  */
object SeqRatio {

  final case class Match(a: Int, b: Int, size: Int)
  /** tag in {"equal","replace","delete","insert"} with [i1,i2) in a, [j1,j2) in b —
    * indices are CODE-POINT offsets. */
  final case class Opcode(tag: String, i1: Int, i2: Int, j1: Int, j2: Int)

  def codePoints(s: String): Array[Int] = s.codePoints().toArray

  final class Matcher(a: Array[Int], b: Array[Int]) {
    def this(a: String, b: String) = this(codePoints(a), codePoints(b))

    private val la = a.length
    private val lb = b.length

    // b2j: code point -> ascending positions in b (primitive arrays), with
    // autojunk-popular removed
    private val b2j: mutable.HashMap[Int, Array[Int]] = {
      val m = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Int]]
      var j = 0
      while (j < lb) {
        m.getOrElseUpdate(b(j), mutable.ArrayBuffer.empty[Int]) += j
        j += 1
      }
      if (lb >= 200) {
        val ntest = lb / 100 + 1
        val popular = m.iterator.collect { case (c, idxs) if idxs.length > ntest => c }.toList
        popular.foreach(m.remove)
      }
      val out = mutable.HashMap.empty[Int, Array[Int]]
      m.foreachEntry((c, buf) => out(c) = buf.toArray)
      out
    }

    // isjunk=None => bjunk empty; isbjunk always false.

    def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): Match = {
      var besti = alo
      var bestj = blo
      var bestsize = 0
      // python's per-row j2len dict as primitive arrays indexed by j, with
      // touched-lists for O(row) clearing — values, visit order, and the
      // strict k > bestsize first-max rule are identical, so results are
      // bit-equal; this removes the boxed HashMap churn from the hot loop
      var prev = new Array[Int](lb)
      var cur = new Array[Int](lb)
      var prevT = new Array[Int](lb)
      var curT = new Array[Int](lb)
      var prevN = 0
      var i = alo
      while (i < ahi) {
        var curN = 0
        val idxs = b2j.getOrElse(a(i), null)
        if (idxs != null) {
          var p = 0
          var break = false
          while (p < idxs.length && !break) {
            val j = idxs(p)
            if (j < blo) ()
            else if (j >= bhi) break = true
            else {
              // prev holds last row's values only at its touched js (all in
              // [blo, bhi)), zero elsewhere — same as the dict's getOrElse
              val k = (if (j > 0) prev(j - 1) else 0) + 1
              cur(j) = k
              curT(curN) = j // idxs are distinct, so j is touched once
              curN += 1
              if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
            }
            p += 1
          }
        }
        // zero prev's touched entries, then swap rows
        var t = 0
        while (t < prevN) { prev(prevT(t)) = 0; t += 1 }
        val sw = prev; prev = cur; cur = sw
        val swT = prevT; prevT = curT; curT = swT
        prevN = curN
        i += 1
      }
      // Extend over non-junk (all elements are non-junk here except popular,
      // which were removed from b2j but remain extendable — matching
      // CPython where isbjunk is False for popular elements).
      var bi = besti; var bj = bestj; var bs = bestsize
      while (bi > alo && bj > blo && a(bi - 1) == b(bj - 1)) {
        bi -= 1; bj -= 1; bs += 1
      }
      while (bi + bs < ahi && bj + bs < bhi && a(bi + bs) == b(bj + bs)) bs += 1
      Match(bi, bj, bs)
    }

    lazy val matchingBlocks: Vector[Match] = {
      val queue = mutable.Stack((0, la, 0, lb))
      val blocks = mutable.ArrayBuffer.empty[Match]
      while (queue.nonEmpty) {
        val (alo, ahi, blo, bhi) = queue.pop()
        val m = findLongestMatch(alo, ahi, blo, bhi)
        if (m.size > 0) {
          blocks += m
          if (alo < m.a && blo < m.b) queue.push((alo, m.a, blo, m.b))
          if (m.a + m.size < ahi && m.b + m.size < bhi)
            queue.push((m.a + m.size, ahi, m.b + m.size, bhi))
        }
      }
      val sorted = blocks.sortBy(m => (m.a, m.b, m.size))
      // merge adjacent
      var i1 = 0; var j1 = 0; var k1 = 0
      val out = mutable.ArrayBuffer.empty[Match]
      sorted.foreach { case Match(i2, j2, k2) =>
        if (i1 + k1 == i2 && j1 + k1 == j2) k1 += k2
        else {
          if (k1 > 0) out += Match(i1, j1, k1)
          i1 = i2; j1 = j2; k1 = k2
        }
      }
      if (k1 > 0) out += Match(i1, j1, k1)
      out += Match(la, lb, 0)
      out.toVector
    }

    lazy val opcodes: Vector[Opcode] = {
      var i = 0; var j = 0
      val answer = mutable.ArrayBuffer.empty[Opcode]
      matchingBlocks.foreach { case Match(ai, bj, size) =>
        val tag =
          if (i < ai && j < bj) "replace"
          else if (i < ai) "delete"
          else if (j < bj) "insert"
          else ""
        if (tag.nonEmpty) answer += Opcode(tag, i, ai, j, bj)
        i = ai + size; j = bj + size
        if (size > 0) answer += Opcode("equal", ai, i, bj, j)
      }
      answer.toVector
    }

    def ratio: Double = {
      val matches = matchingBlocks.iterator.map(_.size).sum
      if (la + lb == 0) 1.0 else 2.0 * matches / (la + lb)
    }
  }

  /** difflib.SequenceMatcher(None, a, b).ratio() */
  def ratio(a: String, b: String): Double = new Matcher(a, b).ratio

  /** Opcodes with CODE-POINT indices (python-faithful). */
  def opcodes(a: String, b: String): Vector[Opcode] = new Matcher(a, b).opcodes

  def opcodesCp(a: Array[Int], b: Array[Int]): Vector[Opcode] = new Matcher(a, b).opcodes
}
