package graft.clean

import java.util.regex.Pattern

import graft.json.{JArr, JBig, JBool, JInt, JNull, JNum, JObj, JStr, JValue, PyJson, PyJsonParseException}
import graft.text.Py

/** Per-row lineage counters for the repair ladder — the A1 "clean_ops"
  * record (dots_ocr/utils/output_cleaner.py:50-55,115-123).
  */
final case class CleanOps(
    opType: String,                 // "list" | "str" | "none"
    originalCount: Int = 0,         // list path
    bboxFixes: Int = 0,
    removedItems: Int = 0,
    finalCount: Int = 0,
    originalLength: Int = 0,        // string path
    delimiterFixes: Int = 0,
    tailTruncated: Boolean = false,
    truncatedLength: Int = 0,
    duplicateDictsRemoved: Int = 0,
    finalObjects: Int = 0,
    pairDedupRemoved: Int = 0,      // C9 second pass
    success: Boolean = true)

object CleanOps {
  val none: CleanOps = CleanOps(opType = "none")
}

/** Exact port of the reference's `OutputCleaner`
  * (dots_ocr/utils/output_cleaner.py:32-435): the ordered repair ladder for
  * malformed layout-model JSON. Regex/string semantics follow CPython
  * (lazy quantifiers, Unicode `\s`, `str.strip`/`rstrip`/`count`/`rfind`) —
  * see SURVEY.md §7.4.4. All state is local; one instance's compiled
  * patterns are shared per partition (Q2 idiom, SURVEY §2.10).
  */
object OutputCleaner {

  // output_cleaner.py:37-39. The two hot patterns (dict blocks, missing
  // delimiters) are hand-rolled scanners below: they run over the 50KB+
  // repair tails where java.util.regex cost dominated the corpus average
  // (~1.3ms/row), and — unlike Java's Unicode \s — they use Python's exact
  // \s set (Py.isSpace: includes U+001C-001F), closing the round-1 declared
  // separator divergence. Equivalence to the regexes is property-tested.
  /** Python re's `\s` (= CPython Py_UNICODE_ISSPACE = [[graft.text.Py.isSpace]])
    * as an explicit Java character class: \t-\r, the information separators
    * U+001C-001F (NOT in Unicode White_Space, so neither Java default \s nor
    * UNICODE_CHARACTER_CLASS \s covers them), space, NEL U+0085, and the
    * Zs/Zl/Zp categories (incl. NBSP, which Java's \s excludes). Property-
    * tested char-for-char against Py.isSpace over the full BMP.
    */
  private[graft] val PyWs = """[\t-\r\x1c-\x1f \x{85}\p{Zs}\p{Zl}\p{Zp}]"""
  private val BboxPattern = Pattern.compile(
    s""""bbox"$PyWs*:$PyWs*\\[([^\\]]+)\\]""")
  private val CategoryPattern = Pattern.compile(
    s""""category"$PyWs*:$PyWs*"([^"]+)"""")
  private val TextPrefixPattern = Pattern.compile(
    s""""text"$PyWs*:$PyWs*"([^"]{0,10000})""")

  /** Find-all equivalent of CPython's
    * `\{[^{}]*?"bbox"\s*:\s*\[[^\]]*?\][^{}]*?\}` (lazy, DOTALL-irrelevant):
    * minimal blocks `{ ... }` with no inner braces outside the bbox array,
    * containing `"bbox"` ws `:` ws `[` ... first `]`. Lazy backtracking ≡
    * trying each `"bbox"` occurrence (brace-free from the `{`) in order.
    */
  private[graft] def findDictBlocks(text: String): Vector[String] = {
    val n = text.length
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < n) {
      if (text.charAt(i) != '{') i += 1
      else {
        var matchEnd = -1
        var p = i + 1
        var braceFree = true
        while (matchEnd < 0 && braceFree && p < n) {
          val c = text.charAt(p)
          if (c == '{' || c == '}') braceFree = false
          else {
            if (c == '"' && text.startsWith("bbox\"", p + 1)) {
              var q = p + 6
              while (q < n && Py.isSpace(text.charAt(q))) q += 1
              if (q < n && text.charAt(q) == ':') {
                q += 1
                while (q < n && Py.isSpace(text.charAt(q))) q += 1
                if (q < n && text.charAt(q) == '[') {
                  var r = q + 1
                  while (r < n && text.charAt(r) != ']') r += 1
                  if (r < n) {
                    var t = r + 1
                    var ok = true
                    while (t < n && ok && text.charAt(t) != '}') {
                      if (text.charAt(t) == '{') ok = false else t += 1
                    }
                    if (ok && t < n) matchEnd = t
                  }
                }
              }
            }
            if (matchEnd < 0) p += 1
          }
        }
        if (matchEnd >= 0) {
          out += text.substring(i, matchEnd + 1)
          i = matchEnd + 1
        } else i += 1
      }
    }
    out.result()
  }

  /** Result of `clean_model_output` (output_cleaner.py:418-435): either the
    * cleaned list of cell objects, or — on the outer exception path — the
    * input returned unchanged.
    */
  final case class CleanResult(cleaned: Either[String, Vector[JValue]], ops: CleanOps)

  /** output_cleaner.py:418-435. `input` is Right(list) when the upstream
    * json.loads produced a Python list, else Left(raw-string) (CPython calls
    * `str()` on non-list input; our engine only ever passes strings there).
    */
  def cleanModelOutput(input: Either[String, Vector[JValue]]): CleanResult = {
    try {
      val (data, ops0) = input match {
        case Right(list) => cleanListData(list)
        case Left(str)   => cleanStringData(str)
      }
      finishClean(input, data, ops0)
    } catch {
      case _: Exception =>
        // output_cleaner.py:433-435 — return model_output unchanged
        CleanResult(input.left.map(identity), CleanOps.none.copy(success = false))
    }
  }

  /** The C9 tail of [[cleanModelOutput]] (pair/bbox dedup + the outer
    * TypeError catch), shared with the fused repair path
    * ([[StrictRepair]]), which computes (data, ops) without the ladder's
    * rescans and must then behave EXACTLY like the remainder of
    * clean_model_output.
    */
  private[clean] def finishClean(input: Either[String, Vector[JValue]],
                                 data: Vector[JValue],
                                 ops0: CleanOps): CleanResult =
    try {
      if (ops0.success && data.nonEmpty) {
        val (deduped, removed) = removeDuplicateCategoryTextPairsAndBbox(data)
        CleanResult(Right(deduped), ops0.copy(pairDedupRemoved = removed))
      } else CleanResult(Right(data), ops0)
    } catch {
      case _: Exception =>
        CleanResult(input.left.map(identity), CleanOps.none.copy(success = false))
    }

  /** output_cleaner.py:43-107 — triage of an already-parsed list. */
  def cleanListData(data: Vector[JValue]): (Vector[JValue], CleanOps) = {
    var bboxFixes = 0
    var removed = 0
    val out = Vector.newBuilder[JValue]
    data.foreach {
      case item: JObj =>
        item.get("bbox") match {
          case Some(JArr(bbox)) if bbox.length == 3 =>
            // keep only category/text, in that order (output_cleaner.py:67-80)
            var ni = JObj(Vector.empty)
            item.get("category").foreach(v => ni = ni.put("category", v))
            item.get("text").foreach(v => ni = ni.put("text", v))
            if (ni.entries.nonEmpty) { out += ni; bboxFixes += 1 } else removed += 1
          case Some(JArr(bbox)) if bbox.length == 4 =>
            out += item
          case Some(_) =>
            removed += 1 // abnormal bbox format
          case None =>
            if (item.contains("category")) out += item else removed += 1
        }
      case _ => removed += 1 // non-dict item
    }
    val res = out.result()
    (res, CleanOps(opType = "list", originalCount = data.length, bboxFixes = bboxFixes,
      removedItems = removed, finalCount = res.length))
  }

  /** output_cleaner.py:109-169 — the string repair ladder. */
  def cleanStringData(dataStr: String): (Vector[JValue], CleanOps) = {
    var ops = CleanOps(opType = "str", originalLength = dataStr.length)
    try {
      val (s1, delimiterFixes) = fixMissingDelimiters(dataStr)
      ops = ops.copy(delimiterFixes = delimiterFixes)
      val (s2, truncated) = truncateLastIncompleteElement(s1)
      ops = ops.copy(tailTruncated = truncated, truncatedLength = s2.length)
      val (s3, dupRemoves) = removeDuplicateCompleteDictsPreserveOrder(s2)
      ops = ops.copy(duplicateDictsRemoved = dupRemoves)
      val s4 = ensureJsonFormat(s3)
      parseFinalJson(s4) match {
        case Some(finalData) =>
          (finalData, ops.copy(finalObjects = finalData.length, success = true))
        case None =>
          (Vector.empty, ops.copy(success = false))
      }
    } catch {
      case _: Exception => (Vector.empty, ops.copy(success = false))
    }
  }

  /** output_cleaner.py:171-186 — `re.sub(r'\}\s*\{(?!")', '},{')` as a
    * single scan (Python \s via Py.isSpace).
    */
  def fixMissingDelimiters(text: String): (String, Int) = {
    val n = text.length
    var i = 0
    var fixes = 0
    var sb: java.lang.StringBuilder = null
    var copied = 0
    while (i < n) {
      if (text.charAt(i) == '}') {
        var j = i + 1
        while (j < n && Py.isSpace(text.charAt(j))) j += 1
        if (j < n && text.charAt(j) == '{' && (j + 1 >= n || text.charAt(j + 1) != '"')) {
          if (sb == null) sb = new java.lang.StringBuilder(n + 16)
          sb.append(text, copied, i)
          sb.append("},{")
          fixes += 1
          i = j + 1 // scan resumes after the consumed `}...{`
          copied = i
        } else i += 1
      } else i += 1
    }
    if (sb == null) (text, 0)
    else {
      sb.append(text, copied, n)
      (sb.toString, fixes)
    }
  }

  /** output_cleaner.py:188-220 */
  def truncateLastIncompleteElement(text: String): (String, Boolean) = {
    val needsTruncation = text.length > 50000 || !Py.strip(text).endsWith("]")
    if (needsTruncation) {
      val bboxCount = Py.count(text, "{\"bbox\":")
      if (bboxCount <= 1) return (text, false)
      val lastBboxPos = Py.rfind(text, "{\"bbox\":")
      if (lastBboxPos > 0) {
        var truncated = Py.rstrip(text.substring(0, lastBboxPos))
        if (truncated.endsWith(",")) truncated = truncated.substring(0, truncated.length - 1)
        return (truncated, true)
      }
    }
    (text, false)
  }

  /** output_cleaner.py:222-254 — first-occurrence dedup of complete dict
    * substrings; on any duplicate the array is REBUILT with `", "` joins.
    */
  def removeDuplicateCompleteDictsPreserveOrder(text: String): (String, Int) = {
    val blocks = findDictBlocks(text)
    if (blocks.isEmpty) return (text, 0)
    val unique = Vector.newBuilder[String]
    val seen = scala.collection.mutable.HashSet.empty[String]
    var dups = 0
    blocks.foreach { d =>
      if (seen.add(d)) unique += d else dups += 1
    }
    if (dups > 0) ("[" + unique.result().mkString(", ") + "]", dups)
    else (text, 0)
  }

  /** output_cleaner.py:256-269 */
  def ensureJsonFormat(text0: String): String = {
    var text = Py.strip(text0)
    if (!text.startsWith("[")) text = "[" + text
    if (!text.endsWith("]")) {
      text = Py.rstrip(Py.rstrip(text, ","))
      text = text + "]"
    }
    text
  }

  /** output_cleaner.py:271-299 — parse; fallback1 = per-match dict salvage;
    * fallback2 = single-incomplete-dict recovery. A successful parse of a
    * non-list returns None in CPython (no exception), mirrored here.
    */
  def parseFinalJson(text: String): Option[Vector[JValue]] = {
    try {
      PyJson.parse(text) match {
        case JArr(items) => return Some(items)
        case _           => return None
      }
    } catch {
      case _: PyJsonParseException =>
        val valid = Vector.newBuilder[JValue]
        var n = 0
        findDictBlocks(text).foreach { block =>
          try { valid += PyJson.parse(block); n += 1 }
          catch { case _: PyJsonParseException => () }
        }
        if (n > 0) return Some(valid.result())
        return handleSingleIncompleteDict(text)
    }
    None
  }

  /** output_cleaner.py:301-345 */
  def handleSingleIncompleteDict(text: String): Option[Vector[JValue]] = {
    if (!Py.strip(text).startsWith("[{\"bbox\":")) return None
    try {
      val bboxM = BboxPattern.matcher(text)
      if (!bboxM.find()) return None
      val coords = bboxM.group(1).split(",", -1).toVector.map(x => Py.pyInt(x))
      if (coords.length != 4) return None
      val catM = CategoryPattern.matcher(text)
      val category = if (catM.find()) catM.group(1) else "Text"
      val textM = TextPrefixPattern.matcher(text)
      val textContent = if (textM.find()) textM.group(1) else ""
      var fixed = JObj(Vector.empty)
        .put("bbox", JArr(coords.map(c =>
          (if (c.isValidLong) JInt(c.toLong) else JBig(c)): JValue)))
        .put("category", JStr(category))
      if (textContent.nonEmpty) fixed = fixed.put("text", JStr(textContent))
      Some(Vector(fixed))
    } catch {
      case _: Exception => None
    }
  }

  /** Python TypeError analog in the C9 dedup: hashing a key that contains a
    * list/dict raises in CPython (`tuple(bbox)` with a nested list, or a
    * non-scalar category/text), and so does slicing a non-str text in the
    * ≥5-pair debug print; either aborts clean_model_output and returns the
    * input UNCHANGED (output_cleaner.py:433-435).
    */
  private final class UnhashableKeyException
    extends RuntimeException("TypeError in dedup key handling")

  /** Canonical dedup-key form mirroring Python `==`/hash across types:
    * numbers and bools compare numerically (1 == 1.0 == True), NaN never
    * equals anything (fresh identity per occurrence), strings and None only
    * equal their own kind; lists/dicts are unhashable.
    */
  private def pyKey(v: JValue): Any = v match {
    case JStr(s)  => s
    case JInt(i)  => java.math.BigDecimal.valueOf(i).stripTrailingZeros
    case JBig(i)  => new java.math.BigDecimal(i.bigInteger).stripTrailingZeros
    case JBool(b) => java.math.BigDecimal.valueOf(if (b) 1L else 0L).stripTrailingZeros
    case JNum(d)  =>
      if (d.isNaN) new Object // nan != nan: no two occurrences ever dedup
      else if (d.isInfinite) ("inf", d > 0)
      else new java.math.BigDecimal(d).stripTrailingZeros // exact binary value
    case JNull    => JNull
    case _: JArr | _: JObj => throw new UnhashableKeyException
  }

  /** output_cleaner.py:347-416 — positional dedup: (category,text) pairs
    * appearing ≥5 times and exact bboxes appearing ≥2 times keep only their
    * first occurrence. Returns (cleaned, removedCount).
    */
  def removeDuplicateCategoryTextPairsAndBbox(dataList: Vector[JValue]): (Vector[JValue], Int) = {
    if (dataList.length <= 1) return (dataList, 0)

    val pairPositions = scala.collection.mutable.LinkedHashMap.empty[(Any, Any), List[Int]]
    dataList.zipWithIndex.foreach {
      case (item: JObj, i) if item.contains("category") && item.contains("text") =>
        val key = (pyKey(item.get("category").getOrElse(JStr(""))),
          pyKey(item.get("text").getOrElse(JStr(""))))
        pairPositions(key) = pairPositions.getOrElse(key, Nil) :+ i
      case _ => ()
    }

    val bboxPositions = scala.collection.mutable.LinkedHashMap.empty[Vector[Any], List[Int]]
    dataList.zipWithIndex.foreach {
      case (item: JObj, i) =>
        item.get("bbox") match {
          case Some(JArr(bbox)) if bbox.nonEmpty =>
            val key = bbox.map(pyKey)
            bboxPositions(key) = bboxPositions.getOrElse(key, Nil) :+ i
          case _ => ()
        }
      case _ => ()
    }

    val toRemove = scala.collection.mutable.HashSet.empty[Int]
    pairPositions.foreach {
      case ((_, textKey), pos) if pos.length >= 5 =>
        // CPython quirk (output_cleaner.py:386): the debug print slices
        // `text[:50]` — a non-str text value (int/float/bool/None) raises
        // TypeError THERE, aborting the whole clean → input returned
        // unchanged. pyKey maps JStr (and only JStr) to a plain String.
        if (!textKey.isInstanceOf[String]) throw new UnhashableKeyException
        toRemove ++= pos.tail
      case _ => ()
    }
    bboxPositions.foreach { case (_, pos) if pos.length >= 2 => toRemove ++= pos.tail; case _ => () }

    if (toRemove.isEmpty) (dataList, 0)
    else {
      val cleaned = dataList.zipWithIndex.collect { case (item, i) if !toRemove.contains(i) => item }
      (cleaned, toRemove.size)
    }
  }
}
