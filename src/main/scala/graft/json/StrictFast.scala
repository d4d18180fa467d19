package graft.json

import graft.geom.SmartResize

/** Fused strict-parse → bbox-rescale → json.dumps transcoder for the
  * majority path (layout payloads that parse strictly — ~75% of the
  * corpus).
  *
  * The tree path (PyJson.parse → ExtractTurn.postProcessCells →
  * PyJson.dumps) allocates a full JValue tree, a rescale copy of it, and a
  * dump walk (~12 KB/turn measured); this transcoder produces the
  * IDENTICAL `cells_json` bytes plus the lean per-cell fields the markdown
  * renderer needs (category, text, rescaled bbox) in ONE pass over the
  * input with a single output builder, no tree.
  *
  * Byte-equality is preserved by construction, not by reimplementation
  * drift: any shape outside the proven-equal common case returns None and
  * the caller REPLAYS the original tree path (so error/repair
  * classification, duplicate-key dict semantics, string bboxes, etc. are
  * byte-identical by definition — they take the old code). Bail-out cases:
  * parse errors, top-level non-array/empty, non-object cells, duplicate
  * keys in any object, missing/non-array/short bbox, non-plain-number bbox
  * coords, missing/non-string category, non-string text, >18-digit ints,
  * non-finite floats, nesting beyond the parser's depth bound.
  *
  * Emission rules proven equal to PyJson.dumps(ensure_ascii=False):
  * escape-free strings re-emit as their raw source region (strict JSON
  * rejects raw control chars, so nothing in the region needs escaping);
  * escaped strings unescape and re-emit through the same writeString;
  * canonical int tokens re-emit raw (NUMBER_RE forbids leading zeros and
  * '+'; the one non-canonical token, "-0", emits "0" like Long 0); floats
  * re-emit as Py.floatRepr(parsed double); NaN/Infinity literals re-emit
  * verbatim; separators are normalized to ", " / ": ".
  */
object StrictFast {

  /** The renderer-facing projection of a rescaled cell. `text` is "" when
    * the key is absent (matching dict.get(text, "")).
    */
  final case class LeanCell(category: String, text: String,
                            x1: Int, y1: Int, x2: Int, y2: Int)

  /** Tri-state result. [[ParseFail]] is a GUARANTEE: the input violates the
    * JSON grammar exactly as PyJson.parse accepts it, so the tree parse
    * would throw — the caller can go straight to the repair ladder with the
    * raw text, paying NO second scan (the transcoder's scan replaces the
    * tree path's failed parse attempt). [[ShapeFail]] means the input may
    * be valid JSON but falls outside the fused path's proven-equal shape —
    * the caller must replay the tree path in full. The
    * ParseFail-equivalence is asserted corpus-wide and adversarially in the
    * specs (transcode == ParseFail ⇒ PyJson.parse throws).
    */
  sealed trait Result
  final case class Ok(cellsJson: String, cells: Vector[LeanCell]) extends Result
  case object ParseFail extends Result
  case object ShapeFail extends Result

  /** [[ParseFail]] with the trailing-comma signature: every top-level cell
    * transcoded strictly, then the cell position held `]` (i.e. the payload
    * ends `..., ]`-style — the >50k truncation class). Same guarantee as
    * ParseFail (the tree parse throws here too: `]` cannot start a value);
    * the extra tag lets the caller try [[graft.clean.StrictRepair]], which
    * re-transcodes in capture mode for the fused repair-ladder path.
    */
  case object ParseFailTrail extends Result

  /** Capture-mode variant of [[ParseFailTrail]]: the per-cell state the
    * fused repair path needs. `bracketPos` is the index of the `]` the cell
    * parser saw.
    */
  final case class ParseFailTrailCaptured(cells: Vector[RepairCell],
                                          bracketPos: Int) extends Result

  /** Raw-source capture of one strictly-transcoded cell, for the fused
    * repair path: span in the source text, the ORIGINAL (pre-rescale) bbox
    * values as JValues (what the tree parse would produce), and whether the
    * `text` key was present (LeanCell can't distinguish absent from "").
    */
  final case class RepairCell(rawStart: Int, rawEnd: Int, category: String,
                              text: String, hasText: Boolean,
                              bbox: Vector[JValue], bboxExtra: Boolean)

  /** Stackless control-flow signals. */
  private final class Bail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private val BailParse = new Bail
  private val BailShape = new Bail
  private val BailParseTrail = new Bail

  private val MaxDepth = 1000

  /** Attempt the fused path. */
  def transcode(text: String, scaleX: Double, scaleY: Double): Result =
    run(text, scaleX, scaleY, capture = false)

  /** The fused path with per-cell raw capture (for [[graft.clean
    * .StrictRepair]]): same grammar and bail sites, slightly more
    * allocation — only invoked on rows already tagged [[ParseFailTrail]].
    */
  def transcodeCapture(text: String, scaleX: Double, scaleY: Double): Result =
    run(text, scaleX, scaleY, capture = true)

  private def run(text: String, scaleX: Double, scaleY: Double,
                  capture: Boolean): Result = {
    val t = new Transcoder(text, scaleX, scaleY, capture)
    try {
      val (json, cells) = t.run()
      Ok(json, cells)
    } catch {
      case e if e eq BailParse => ParseFail
      case e if e eq BailParseTrail =>
        if (capture) ParseFailTrailCaptured(t.capturedCells, t.trailBracketPos)
        else ParseFailTrail
      case e if e eq BailShape => ShapeFail
      // defense in depth: an UNEXPECTED exception here must degrade to a
      // full tree-path replay, never reclassify the row as an error the
      // tree path wouldn't produce
      case scala.util.control.NonFatal(_) => ShapeFail
    }
  }

  private final class Transcoder(s: String, scaleX: Double, scaleY: Double,
                                 capture: Boolean = false) {
    private var pos = 0
    private var depth = 0
    private val sb = new java.lang.StringBuilder(s.length + 64)

    // capture-mode state (allocated only when capture=true)
    private val cellCapture =
      if (capture) Vector.newBuilder[RepairCell] else null
    private[StrictFast] var trailBracketPos = -1
    private[StrictFast] def capturedCells: Vector[RepairCell] =
      if (cellCapture == null) Vector.empty else cellCapture.result()
    // last number scanned by numberAsDouble (for original-bbox capture)
    private var lastNumWasInt = false
    private var lastNumLong = 0L

    /** Grammar violation — PyJson.parse provably throws here too. Every
      * bailP site corresponds to a failure site of the tree parser on the
      * same character (same grammar: NUMBER_RE, escape set, \\uXXXX via the
      * identical Integer.parseInt, depth bound, delimiter expectations,
      * Extra data check).
      */
    private def bailP(): Nothing = throw BailParse

    /** Valid-so-far JSON outside the fused shape — caller replays the tree
      * path in full. Always the safe choice when ambiguous.
      */
    private def bailS(): Nothing = throw BailShape

    private def peek: Char = if (pos < s.length) s.charAt(pos) else ' '

    /** Could `c` start ANY value PyJson.parse accepts? If not, parseValue
      * fails right here — a bailP, not a bailS. (Chars IN this set may
      * still fail later — e.g. "Nxx" — those stay conservative bailS
      * sites; the tree replay settles them.)
      */
    private def canStartValue(c: Char): Boolean =
      c == '{' || c == '[' || c == '"' || c == 't' || c == 'f' || c == 'n' ||
        c == 'N' || c == 'I' || c == '-' || (c >= '0' && c <= '9')

    private def skipWs(): Unit = {
      while (pos < s.length && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t' ||
        s.charAt(pos) == '\n' || s.charAt(pos) == '\r')) pos += 1
    }

    private def enter(): Unit = {
      depth += 1
      if (depth > MaxDepth) bailP() // tree parse raises RecursionError here
    }
    private def exit(): Unit = depth -= 1

    def run(): (String, Vector[LeanCell]) = {
      skipWs()
      if (peek != '[') bailS() // may be a valid non-list value → pyStr path
      pos += 1
      enter() // the tree parser counts the top-level array toward MaxDepth
      skipWs()
      if (peek == ']') bailS() // valid: empty list → tree assert → repair
      sb.append('[')
      val cells = Vector.newBuilder[LeanCell]
      var first = true
      var done = false
      while (!done) {
        skipWs()
        if (!first) sb.append(", ")
        first = false
        cells += cell()
        skipWs()
        peek match {
          case ',' => pos += 1
          case ']' => pos += 1; done = true
          case _   => bailP() // "Expecting ',' delimiter"
        }
      }
      exit()
      sb.append(']')
      skipWs()
      if (pos != s.length) bailP() // "Extra data"
      (sb.toString, cells.result())
    }

    /** One top-level cell object: transcode keys in source order, replace
      * the bbox value with the rescaled 4-int array in place, capture
      * category/text.
      */
    private def cell(): LeanCell = {
      if (peek != '{') {
        // ']' after a trailing comma, ',' etc. cannot start a value: the
        // tree parser fails here too (the >50k truncation class ends
        // "...},]" — this turns its 58KB rows into ParseFail, skipping the
        // redundant tree re-parse)
        if (canStartValue(peek)) bailS() // valid non-dict cell → KeyError → repair
        else if (peek == ']' && pos < s.length) {
          // the trailing-comma signature: all prior cells strict, then `]`
          // where a value must start — tag it so StrictRepair can fuse the
          // repair ladder for this class (same ParseFail guarantee)
          trailBracketPos = pos
          throw BailParseTrail
        } else bailP() // "Expecting value"
      }
      val rawStart = pos
      enter()
      pos += 1
      skipWs()
      if (peek == '}') bailS() // valid: no bbox → KeyError → repair
      sb.append('{')
      var category: String = null
      var cellText: String = ""
      var hasText = false
      var hasBbox = false
      var bboxExtra = false
      var x1 = 0; var y1 = 0; var x2 = 0; var y2 = 0
      val bboxCap = if (capture) Vector.newBuilder[JValue] else null
      val seen = new scala.collection.mutable.ArrayBuffer[String](4)
      var first = true
      var done = false
      while (!done) {
        skipWs()
        if (peek != '"') bailP() // "Expecting property name"
        if (!first) sb.append(", ")
        first = false
        val kStart = pos
        val k = string(emit = false)
        if (seen.contains(k)) bailS() // dup key: dict put semantics → tree path
        seen += k
        // re-emit the key from source (escape-free) or via writeString
        emitCapturedString(kStart, k)
        skipWs()
        if (peek != ':') bailP() // "Expecting ':' delimiter"
        pos += 1
        sb.append(": ")
        skipWs()
        k match {
          case "bbox" =>
            hasBbox = true
            val b = bboxValue(bboxCap)
            x1 = b(0); y1 = b(1); x2 = b(2); y2 = b(3)
            bboxExtra = lastBboxHadExtras
          case "category" =>
            if (peek != '"') {
              if (canStartValue(peek)) bailS() // non-string category → error row
              else bailP()
            }
            val vStart = pos
            category = string(emit = false)
            emitCapturedString(vStart, category)
          case "text" =>
            if (peek != '"') {
              if (canStartValue(peek)) bailS() else bailP()
            }
            val vStart = pos
            cellText = string(emit = false)
            hasText = true
            emitCapturedString(vStart, cellText)
          case _ =>
            value(emit = true)
        }
        skipWs()
        peek match {
          case ',' => pos += 1
          case '}' => pos += 1; done = true
          case _   => bailP() // "Expecting ',' delimiter"
        }
      }
      exit()
      sb.append('}')
      if (!hasBbox || category == null) bailS()
      if (capture)
        cellCapture += RepairCell(rawStart, pos, category, cellText, hasText,
          bboxCap.result(), bboxExtra)
      LeanCell(category, cellText, x1, y1, x2, y2)
    }

    /** bbox: a JSON array of ≥4 plain finite numbers (extras validated and
      * dropped, like items(0..3) indexing); emits the rescaled ints. In
      * capture mode the ORIGINAL first-4 values are appended to `cap` as
      * the JValues the tree parse would produce.
      */
    private var lastBboxHadExtras = false

    private def bboxValue(cap: scala.collection.mutable.ReusableBuilder[JValue, Vector[JValue]]): Array[Int] = {
      lastBboxHadExtras = false
      if (peek != '[') {
        if (canStartValue(peek)) bailS() // valid non-array bbox (string, …)
        else bailP() // "Expecting value"
      }
      enter()
      pos += 1
      skipWs()
      if (peek == ']') { pos += 1; exit(); bailS() } // valid: [] → IndexError → repair
      val out = new Array[Int](4)
      var i = 0
      var done = false
      while (!done) {
        skipWs()
        if (i < 4) {
          val d = numberAsDouble()
          if (cap != null)
            cap += (if (lastNumWasInt) JInt(lastNumLong) else JNum(d))
          val scale = if (i % 2 == 0) scaleX else scaleY
          out(i) = SmartResize.scaleCoord(d, scale)
        } else {
          lastBboxHadExtras = true
          value(emit = false) // validated, dropped (tree path reads [0..3])
        }
        i += 1
        skipWs()
        peek match {
          case ',' => pos += 1
          case ']' => pos += 1; done = true
          case _   => bailP() // "Expecting ',' delimiter"
        }
      }
      exit()
      if (i < 4) bailS() // valid but short → IndexError → repair
      sb.append('[').append(out(0)).append(", ").append(out(1)).append(", ")
        .append(out(2)).append(", ").append(out(3)).append(']')
      out
    }

    /** A plain finite JSON number as pyFloat would see it (JInt → toDouble,
      * JNum → d). Anything else — NaN/Infinity literals, huge ints,
      * strings — bails to the tree path.
      */
    private def numberAsDouble(): Double = {
      val c = peek
      // chars that START a valid JSON value which just isn't a plain number
      if (c == '"' || c == '{' || c == '[' || c == 't' || c == 'f' ||
        c == 'n' || c == 'N' || c == 'I' ||
        (c == '-' && s.startsWith("-Infinity", pos))) bailS()
      if (c != '-' && (c < '0' || c > '9')) bailP() // "Expecting value"
      val start = pos
      val isFloat = scanNumber()
      if (isFloat) {
        val d = java.lang.Double.parseDouble(s.substring(start, pos))
        if (java.lang.Double.isInfinite(d)) bailS() // valid JSON, odd value
        lastNumWasInt = false
        d
      } else {
        if (pos - start > 18) bailS()
        lastNumWasInt = true
        lastNumLong = parseLongInPlace(start, pos)
        lastNumLong.toDouble
      }
    }

    /** Scans a CPython NUMBER_RE token from `pos`; returns isFloat. Callers
      * guarantee the '-Infinity' literal was dispatched beforehand, so a
      * digit-less token here fails the tree parser's parseNumber too.
      */
    private def scanNumber(): Boolean = {
      if (peek == '-') pos += 1
      if (peek == '0') pos += 1
      else if (peek >= '1' && peek <= '9') {
        while (peek >= '0' && peek <= '9') pos += 1
      } else bailP()
      var isFloat = false
      if (peek == '.') {
        val save = pos
        pos += 1
        if (peek >= '0' && peek <= '9') {
          isFloat = true
          while (peek >= '0' && peek <= '9') pos += 1
        } else pos = save
      }
      if (peek == 'e' || peek == 'E') {
        val save = pos
        pos += 1
        if (peek == '+' || peek == '-') pos += 1
        if (peek >= '0' && peek <= '9') {
          isFloat = true
          while (peek >= '0' && peek <= '9') pos += 1
        } else pos = save
      }
      isFloat
    }

    private def parseLongInPlace(start: Int, end: Int): Long = {
      var i = start
      var neg = false
      if (s.charAt(i) == '-') { neg = true; i += 1 }
      var v = 0L
      while (i < end) { v = v * 10 + (s.charAt(i) - '0'); i += 1 }
      if (neg) -v else v
    }

    /** Generic value transcode (emit=true) or validate-and-skip
      * (emit=false). Matches PyJson.parse acceptance and PyJson.dumps
      * emission for everything it does not bail on.
      */
    private def value(emit: Boolean): Unit = {
      if (pos >= s.length) bailP()
      peek match {
        case '{' => obj(emit)
        case '[' => arr(emit)
        case '"' =>
          val start = pos
          val v = string(emit = false)
          if (emit) emitCapturedString(start, v)
        case 't' => lit("true", emit)
        case 'f' => lit("false", emit)
        case 'n' => lit("null", emit)
        case 'N' => lit("NaN", emit)
        case 'I' => lit("Infinity", emit)
        case '-' if s.startsWith("-Infinity", pos) =>
          pos += 9; if (emit) sb.append("-Infinity")
        case c if c == '-' || (c >= '0' && c <= '9') =>
          val start = pos
          val isFloat = scanNumber()
          if (emit) {
            if (isFloat)
              sb.append(graft.text.Py.floatRepr(
                java.lang.Double.parseDouble(s.substring(start, pos))))
            else if (pos - start == 2 && s.charAt(start) == '-' && s.charAt(start + 1) == '0')
              sb.append('0') // json.loads("-0") → int 0 → dumps "0"
            else if (pos - start <= 18)
              sb.append(s, start, pos) // canonical already (NUMBER_RE)
            else
              sb.append(s, start, pos) // BigInt(lit).toString == lit
          }
        case _ => bailP() // "Expecting value"
      }
    }

    private def lit(token: String, emit: Boolean): Unit = {
      if (!s.startsWith(token, pos)) bailP() // expectLit failure
      pos += token.length
      if (emit) sb.append(token)
    }

    private def obj(emit: Boolean): Unit = {
      enter()
      pos += 1
      skipWs()
      if (emit) sb.append('{')
      if (peek == '}') { pos += 1; exit(); if (emit) sb.append('}'); return }
      val seen = new scala.collection.mutable.ArrayBuffer[String](4)
      var first = true
      var done = false
      while (!done) {
        skipWs()
        if (peek != '"') bailP() // "Expecting property name"
        if (!first && emit) sb.append(", ")
        first = false
        val kStart = pos
        val k = string(emit = false)
        if (seen.contains(k)) bailS() // dup key → dict put semantics
        seen += k
        if (emit) emitCapturedString(kStart, k)
        skipWs()
        if (peek != ':') bailP()
        pos += 1
        if (emit) sb.append(": ")
        skipWs()
        value(emit)
        skipWs()
        peek match {
          case ',' => pos += 1
          case '}' => pos += 1; done = true
          case _   => bailP()
        }
      }
      exit()
      if (emit) sb.append('}')
    }

    private def arr(emit: Boolean): Unit = {
      enter()
      pos += 1
      skipWs()
      if (emit) sb.append('[')
      if (peek == ']') { pos += 1; exit(); if (emit) sb.append(']'); return }
      var first = true
      var done = false
      while (!done) {
        skipWs()
        if (!first && emit) sb.append(", ")
        first = false
        value(emit)
        skipWs()
        peek match {
          case ',' => pos += 1
          case ']' => pos += 1; done = true
          case _   => bailP()
        }
      }
      exit()
      if (emit) sb.append(']')
    }

    /** Parses a string starting at the opening quote (pos). Returns the
      * UNESCAPED value and records whether the source region was
      * escape-free in [[lastStringRawEnd]] (>= 0 → raw region
      * [start, lastStringRawEnd] including both quotes re-emits verbatim).
      */
    private var lastStringRawEnd = -1

    private def string(emit: Boolean): String = {
      lastStringRawEnd = -1
      val start = pos
      pos += 1
      var i = pos
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"') {
          val out = s.substring(pos, i)
          pos = i + 1
          lastStringRawEnd = i
          if (emit) sb.append(s, start, i + 1)
          return out
        } else if (c == '\\') {
          i = s.length // slow path
        } else if (c < ' ') bailP() // strict: raw control char rejected
        else i += 1
      }
      // slow path: has escapes (or unterminated → parse failure)
      val out = new java.lang.StringBuilder
      while (true) {
        if (pos >= s.length) bailP()
        val c = s.charAt(pos)
        if (c == '"') {
          pos += 1
          val v = out.toString
          if (emit) PyJson.writeStringTo(v, sb)
          return v
        } else if (c == '\\') {
          pos += 1
          if (pos >= s.length) bailP()
          s.charAt(pos) match {
            case '"'  => out.append('"'); pos += 1
            case '\\' => out.append('\\'); pos += 1
            case '/'  => out.append('/'); pos += 1
            case 'b'  => out.append('\b'); pos += 1
            case 'f'  => out.append('\f'); pos += 1
            case 'n'  => out.append('\n'); pos += 1
            case 'r'  => out.append('\r'); pos += 1
            case 't'  => out.append('\t'); pos += 1
            case 'u'  =>
              // EXACTLY PyJson's acceptance (Integer.parseInt(hex, 16) —
              // including its quirks) so ParseFail stays a guarantee
              pos += 1
              if (pos + 4 > s.length) bailP()
              val cp = try Integer.parseInt(s.substring(pos, pos + 4), 16)
              catch { case _: NumberFormatException => bailP() }
              pos += 4
              out.append(cp.toChar)
            case _ => bailP()
          }
        } else if (c < ' ') bailP()
        else { out.append(c); pos += 1 }
      }
      throw new IllegalStateException
    }

    /** Emits a string parsed with emit=false: raw source region when it was
      * escape-free, else re-escaped through the shared writeString.
      */
    private def emitCapturedString(srcStart: Int, value: String): Unit = {
      if (lastStringRawEnd >= 0) sb.append(s, srcStart, lastStringRawEnd + 1)
      else PyJson.writeStringTo(value, sb)
    }
  }
}
