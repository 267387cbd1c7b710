package graft.vote

import scala.collection.mutable
import graft.model.TextWithBox
import graft.text.{Py, SeqRatio}

/** ROVER (Recognizer Output Voting Error Reduction) core.
  * Faithful port of src/rover/line_processing.py, src/rover/alignment.py,
  * src/rover/ensemble.py:31-169.
  *
  * Python dict insertion-order and `max` first-max-wins tie semantics are
  * observable in voted output, so every map here is an insertion-ordered
  * Vector[(key, value)].
  *
  * Runs entirely in-row per page (bounded fan-in 3 engines) inside
  * mapPartitions — never a shuffle (SURVEY §2.10).
  */
object Rover {

  /** ENGINE_WEIGHTS (ensemble.py:31-36). */
  val EngineWeights: Map[String, Double] =
    Map("yomitoku" -> 1.5, "paddleocr" -> 1.2, "easyocr" -> 1.0)

  final case class OCRLine(items: Vector[TextWithBox], engine: String, yCenter: Double, confidence: Double) {
    def text: String = items.iterator.map(_.text).mkString
  }

  final case class AlignedLine(
      lines: Vector[(String, Option[OCRLine])], // insertion-ordered engine map
      yCenter: Double,
      votedText: String = "",
      sourceEngines: Vector[String] = Vector.empty
  )

  // ---- garbage filtering (line_processing.py:49-94) -----------------------

  def isGarbage(text: String, confidence: Double, minConfidence: Double = 0.5): Boolean = {
    if (text == null || Py.strip(text).isEmpty) return true
    if (confidence < minConfidence) return true
    // python iterates CODE POINTS: len(), the 5-run window, and isalnum
    // all count 𠮷/emoji as ONE element (a UTF-16 loop never sees a
    // 5-run of identical surrogate pairs)
    val cps = Py.codePoints(text)
    // Python: "぀" <= ch <= "ヿ" (kana) or "一" <= ch <= "鿿" (CJK)
    val hasJapanese = cps.exists(cp =>
      (cp >= 0x3040 && cp <= 0x30ff) || (cp >= 0x4e00 && cp <= 0x9fff))
    if (!hasJapanese && cps.length <= 5) return true
    if (cps.length >= 5) {
      var i = 0
      while (i < cps.length - 4) {
        if (cps(i) == cps(i + 1) && cps(i) == cps(i + 2) &&
          cps(i) == cps(i + 3) && cps(i) == cps(i + 4)) return true
        i += 1
      }
    }
    if (cps.forall(cp => !Py.isAlnum(cp))) return true
    false
  }

  /** normalize_confidence (line_processing.py:97-120). */
  def normalizeConfidence(rawConf: Double, engine: String): Double = {
    val (minC, maxC) = engine match {
      case "yomitoku"  => (0.4, 1.0)
      case "paddleocr" => (0.85, 1.0)
      case "easyocr"   => (0.25, 1.0)
      case _           => (0.0, 1.0)
    }
    math.max(0.0, math.min(1.0, (rawConf - minC) / (maxC - minC)))
  }

  // ---- clustering (line_processing.py:123-214) ----------------------------

  /** split_multiline_items: y-gap > threshold vs previous item. */
  def splitMultilineItems(items: Seq[TextWithBox], yGapThreshold: Int = 15): Vector[Vector[TextWithBox]] = {
    if (items.isEmpty) return Vector.empty
    val sorted = items.sortBy(_.yCenter)
    val lines = Vector.newBuilder[Vector[TextWithBox]]
    var current = Vector(sorted.head)
    sorted.tail.foreach { item =>
      if (item.yCenter - current.last.yCenter > yGapThreshold) {
        lines += current
        current = Vector(item)
      } else current :+= item
    }
    lines += current
    lines.result()
  }

  /** cluster_lines_by_y: running-mean distance <= tolerance joins the
    * current line; items x-sorted within line; avg y/conf. */
  def clusterLinesByY(items: Seq[TextWithBox], yTolerance: Int = 20): Vector[OCRLine] = {
    if (items.isEmpty) return Vector.empty
    val sorted = items.sortBy(_.yCenter)
    val lines = Vector.newBuilder[Vector[TextWithBox]]
    var current = Vector(sorted.head)
    sorted.tail.foreach { item =>
      val currentY = current.iterator.map(_.yCenter).sum / current.length
      if (math.abs(item.yCenter - currentY) <= yTolerance) current :+= item
      else { lines += current; current = Vector(item) }
    }
    lines += current
    lines.result().map { lineItems =>
      val xSorted = lineItems.sortBy(_.x1)
      val yc = xSorted.iterator.map(_.yCenter).sum / xSorted.length
      val conf = xSorted.iterator.map(_.confidence).sum / xSorted.length
      OCRLine(xSorted, "", yc, conf)
    }
  }

  /** _cluster_words_to_lines (engines/runners.py:89-192): same running-mean
    * clustering with tolerance 15, emitting one merged TextWithBox per line
    * (x-sorted concat, union bbox, avg confidence). */
  def clusterWordsToLines(words: Seq[TextWithBox], yTolerance: Int = 15): Vector[TextWithBox] = {
    if (words.isEmpty) return Vector.empty
    val sorted = words.sortBy(_.yCenter)
    val lines = Vector.newBuilder[Vector[TextWithBox]]
    var current = Vector(sorted.head)
    sorted.tail.foreach { w =>
      val currentY = current.iterator.map(_.yCenter).sum / current.length
      if (math.abs(w.yCenter - currentY) <= yTolerance) current :+= w
      else { lines += current; current = Vector(w) }
    }
    lines += current
    lines.result().map { lw =>
      val xs = lw.sortBy(_.x1)
      TextWithBox(xs.iterator.map(_.text).mkString,
        xs.iterator.map(_.x1).min, xs.iterator.map(_.y1).min,
        xs.iterator.map(_.x2).max, xs.iterator.map(_.y2).max,
        xs.iterator.map(_.confidence).sum / xs.length)
    }
  }

  /** align_lines_by_y (line_processing.py:217-279), including the cluster
    * advance quirk `i = j if j > i + 1 else i + 1`. */
  def alignLinesByY(
      linesByEngine: Vector[(String, Vector[OCRLine])],
      yTolerance: Int = 30
  ): Vector[AlignedLine] = {
    val all = mutable.ArrayBuffer.empty[(Double, String, Int)]
    linesByEngine.foreach { case (engine, lines) =>
      lines.zipWithIndex.foreach { case (line, idx) => all += ((line.yCenter, engine, idx)) }
    }
    val sorted = all.sortBy(_._1) // stable, key = y only (Python key=lambda x: x[0])
    val engineMap = linesByEngine.toMap
    val used = mutable.HashSet.empty[(String, Int)]
    val aligned = Vector.newBuilder[AlignedLine]
    var i = 0
    while (i < sorted.length) {
      val (yCenter, engine, idx) = sorted(i)
      val linesDict = mutable.ArrayBuffer.empty[(String, Option[OCRLine])]
      var ySum = yCenter
      var count = 1
      linesDict += ((engine, Some(engineMap(engine)(idx))))
      used += ((engine, idx))
      var j = i + 1
      var break = false
      while (j < sorted.length && !break) {
        val (nextY, nextEngine, nextIdx) = sorted(j)
        if (nextY - yCenter <= yTolerance) {
          if (!linesDict.exists(_._1 == nextEngine) && !used.contains((nextEngine, nextIdx))) {
            linesDict += ((nextEngine, Some(engineMap(nextEngine)(nextIdx))))
            used += ((nextEngine, nextIdx))
            ySum += nextY
            count += 1
          }
          j += 1
        } else break = true
      }
      aligned += AlignedLine(linesDict.toVector, ySum / count)
      i = if (j > i + 1) j else i + 1
    }
    aligned.result()
  }

  // ---- character alignment (alignment.py:49-131) --------------------------

  final case class AlignedPosition(
      candidates: Vector[(String, Option[String])], // engine -> char (None = gap)
      confidences: Map[String, Double]
  )

  def alignTextsCharacterLevel(
      texts: Vector[(String, String)],
      eqShortcut: Boolean = true // false only for the BenchAB pre-shortcut baseline
  ): Vector[AlignedPosition] = {
    // python strings are CODE-POINT sequences: lengths, max-by-len base
    // selection, and per-position indexing all count code points (𠮷 is
    // one position, not two UTF-16 units)
    def cpStr(cp: Int): String = new String(Character.toChars(cp))
    val nonEmpty = texts.filter(_._2.nonEmpty)
      .map { case (e, t) => (e, SeqRatio.codePoints(t)) }
    if (nonEmpty.isEmpty) return Vector.empty
    if (nonEmpty.length == 1) {
      val (engine, cps) = nonEmpty.head
      return cps.map(c =>
        AlignedPosition(Vector(engine -> Some(cpStr(c))), Map(engine -> 1.0))).toVector
    }
    // longest text as base; Python max keeps first max
    val (baseEngine, baseCps) = nonEmpty.foldLeft(nonEmpty.head) { (best, cur) =>
      if (cur._2.length > best._2.length) cur else best
    }
    val candidates = Array.fill(baseCps.length)(mutable.ArrayBuffer.empty[(String, Option[String])])
    val confidences = Array.fill(baseCps.length)(mutable.LinkedHashMap.empty[String, Double])
    baseCps.zipWithIndex.foreach { case (c, i) =>
      candidates(i) += ((baseEngine, Some(cpStr(c))))
      confidences(i)(baseEngine) = 1.0
    }
    nonEmpty.foreach { case (engine, cps) =>
      if (engine != baseEngine) {
        def put(i: Int, v: Option[String], conf: Double): Unit = {
          val existing = candidates(i).indexWhere(_._1 == engine)
          if (existing >= 0) candidates(i)(existing) = (engine, v)
          else candidates(i) += ((engine, v))
          confidences(i)(engine) = conf
        }
        // Equal-text shortcut: when this engine's code points match the
        // base exactly, the quadratic matcher is skipped. Bit-identical
        // by the pinned ratio(a,a)==1.0 property (EnsembleSpec): total
        // matched size == n means the matching blocks cover BOTH
        // sequences completely, so every opcode is "equal" with i1==j1 —
        // exactly the single opcode substituted here. At corpus scale
        // engines frequently agree verbatim on clean lines, making this
        // the common case of the per-page vote's hottest inner loop.
        val ops =
          if (eqShortcut && java.util.Arrays.equals(baseCps, cps))
            Vector(SeqRatio.Opcode("equal", 0, baseCps.length, 0, cps.length))
          else SeqRatio.opcodesCp(baseCps, cps)
        ops.foreach {
          case SeqRatio.Opcode("equal", i1, i2, j1, _) =>
            var k = 0
            while (k < i2 - i1) { put(i1 + k, Some(cpStr(cps(j1 + k))), 1.0); k += 1 }
          case SeqRatio.Opcode("replace", i1, i2, j1, j2) =>
            var k = 0
            while (k < math.min(i2 - i1, j2 - j1)) {
              put(i1 + k, Some(cpStr(cps(j1 + k))), 1.0); k += 1
            }
            k = j2 - j1
            while (k < i2 - i1) { put(i1 + k, None, 0.0); k += 1 }
          case SeqRatio.Opcode("delete", i1, i2, _, _) =>
            var k = 0
            while (k < i2 - i1) { put(i1 + k, None, 0.0); k += 1 }
          case _ => // insert: extra chars in `text` don't map to base positions
        }
      }
    }
    candidates.indices.map(i => AlignedPosition(candidates(i).toVector, confidences(i).toMap)).toVector
  }

  /** weighted_vote_character (alignment.py:134-175): first max wins. */
  def weightedVoteCharacter(
      candidates: Vector[(String, Option[String])],
      confidences: Map[String, Double],
      engineWeights: Map[String, Double] = EngineWeights
  ): (String, Double) = {
    if (candidates.isEmpty) return ("", 0.0)
    val votes = mutable.LinkedHashMap.empty[String, Double]
    candidates.foreach {
      case (engine, Some(ch)) =>
        val w = engineWeights.getOrElse(engine, 1.0) * confidences.getOrElse(engine, 0.5)
        votes(ch) = votes.getOrElse(ch, 0.0) + w
      case _ =>
    }
    if (votes.isEmpty) return ("", 0.0)
    val (bestChar, bestW) = votes.foldLeft(("", Double.NegativeInfinity)) {
      case (best @ (_, bw), (ch, w)) => if (w > bw) (ch, w) else best
    }
    (bestChar, bestW)
  }

  /** vote_aligned_text (alignment.py:178-211). NB: the reference passes
    * the LINE-LEVEL normalized confidences to every position's vote — the
    * per-position 1.0/0.0 alignment confidences are never used in voting
    * (observable; required for parity). */
  def voteAlignedText(
      positions: Vector[AlignedPosition],
      confidences: Map[String, Double],
      engineWeights: Map[String, Double] = EngineWeights
  ): (String, Double) = {
    if (positions.isEmpty) return ("", 0.0)
    val sb = new StringBuilder
    var totalWeight = 0.0
    positions.foreach { pos =>
      val (ch, w) = weightedVoteCharacter(pos.candidates, confidences, engineWeights)
      sb.append(ch)
      totalWeight += w
    }
    (sb.toString, totalWeight / positions.length)
  }

  // ---- line vote + page merge (ensemble.py:50-169) ------------------------

  /** vote_line_text (ensemble.py:50-96). */
  def voteLineText(
      alignedLine: AlignedLine,
      engineWeights: Map[String, Double] = EngineWeights
  ): (String, Vector[String], Double) = {
    val validLines = alignedLine.lines.collect { case (e, Some(l)) => (e, l) }
    if (validLines.isEmpty) return ("", Vector.empty, 0.0)
    if (validLines.length == 1) {
      val (engine, line) = validLines.head
      return (line.text, Vector(engine), line.confidence)
    }
    val texts = validLines.map { case (e, l) => (e, l.text) }
    val confidences = validLines.map { case (e, l) => e -> normalizeConfidence(l.confidence, e) }.toMap
    val positions = alignTextsCharacterLevel(texts)
    val (votedText, avgConf) = voteAlignedText(positions, confidences, engineWeights)
    (votedText, validLines.map(_._1), avgConf)
  }

  final case class RoverResult(
      text: String,
      lines: Vector[String],
      aligned: Vector[AlignedLine],
      engineContributions: Map[String, Int],
      gapsFilled: Int
  )

  /** rover_merge (ensemble.py:99-169): garbage filter -> per-engine y
    * clustering -> cross-engine y alignment -> per-line char vote. */
  def roverMerge(
      engineResults: Vector[(String, Vector[TextWithBox])],
      primaryEngine: String = "yomitoku",
      yTolerance: Int = 30
  ): RoverResult = {
    val linesByEngine: Vector[(String, Vector[OCRLine])] = engineResults.flatMap {
      case (engine, items) =>
        val filtered = items.filterNot(it => isGarbage(it.text, it.confidence))
        if (filtered.nonEmpty) {
          val lines = clusterLinesByY(filtered).map(_.copy(engine = engine))
          if (lines.nonEmpty) Some(engine -> lines) else None
        } else None
    }
    if (linesByEngine.isEmpty)
      return RoverResult("", Vector.empty, Vector.empty, Map.empty, 0)

    val aligned = alignLinesByY(linesByEngine, yTolerance)
    val finalLines = Vector.newBuilder[String]
    val contributions = mutable.LinkedHashMap.empty[String, Int]
    engineResults.foreach { case (e, _) => contributions(e) = 0 }
    var gapsFilled = 0
    val alignedOut = aligned.map { al =>
      val (votedText, sourceEngines, _) = voteLineText(al)
      if (votedText.nonEmpty) {
        finalLines += votedText
        sourceEngines.foreach(e => contributions(e) = contributions.getOrElse(e, 0) + 1)
        if (!sourceEngines.contains(primaryEngine) &&
          al.lines.exists(p => p._1 == primaryEngine && p._2.isEmpty)) gapsFilled += 1
      }
      al.copy(votedText = votedText, sourceEngines = sourceEngines)
    }
    val lines = finalLines.result()
    RoverResult(lines.mkString("\n"), lines, alignedOut, contributions.toMap, gapsFilled)
  }
}
