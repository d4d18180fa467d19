package graft.clean

import graft.json.{JArr, JObj, JStr, JValue, StrictFast}
import graft.text.Py

/** Fused repair ladder for the TRAILING-COMMA class (the `..., ]` payloads
  * — dominated by the reference's >50k truncation shape,
  * output_cleaner.py:188-220): rows whose every top-level cell transcodes
  * strictly and whose only defect is a trailing comma before the closing
  * bracket. [[StrictFast]] tags them `ParseFailTrail`; this pass
  * re-transcodes in capture mode and computes `clean_string_data`'s result
  * directly from the captured cells — replacing the ladder's four raw-text
  * rescans (fix_missing_delimiters, truncate, duplicate-dict dedup,
  * parse_final) with one scan plus a handful of `indexOf` sweeps.
  *
  * Equality is by CLASS PROOF with conservative bail-out, the StrictFast
  * technique: every precondition below removes a way the ladder could see
  * this text differently than "cells joined by commas, then `, ]`"; any
  * violation returns None and the caller runs the real ladder (always
  * safe). The preconditions, and the ladder behavior each one pins down:
  *
  *  1. trailer after the `]` is whitespace-only EOF — else "Extra data"
  *     dynamics differ;
  *  2. NO `}` ws* `{`-with-next-char-≠-`"` site anywhere in the raw text
  *     (string-BLIND, like the reference regex) — so fix_missing_delimiters
  *     is the identity and delimiter_fixes = 0;
  *  3. every `{` is a captured cell start and every `}` a cell end
  *     (string-blind) — so find-dict-blocks' brace-free block set is
  *     EXACTLY the cell spans (no in-string or nested-value braces);
  *  4. no bbox extras (>4 items) — so the original bbox JValues are the
  *     captured 4 and the C9 key replay is exact;
  *  5. per-cell: the block pattern (`"bbox"` ws* `:` ws* `[` … first `]`,
  *     then `}` with no `{`) matched from the cell start ends exactly at
  *     the cell end — defense in depth over 3;
  *  6. when the >50000 truncation fires, the cut (last literal
  *     `{"bbox":` occurrence) must be a captured cell start, and the
  *     rstrip+comma-trim must land exactly at the previous cell's end —
  *     so the truncated string is precisely cells 0..j-1.
  *
  * Given these, clean_string_data resolves to: delimiter_fixes=0; tail
  * truncation drops cells j.. (or nothing); duplicate-dict dedup keeps
  * first occurrences of identical raw cell substrings; parse_final yields
  * the kept cells (directly when truncation/dedup removed the trailing
  * comma, via the per-block salvage fallback otherwise — same cells either
  * way). The C9 tail then runs through the REAL
  * [[OutputCleaner.finishClean]] on reconstructed minimal cells
  * (bbox/category/text — the only keys C9 and the md join read).
  *
  * Kill switch: -Dgraft.strictrepair=off (see ExtractTurn). Corpus-wide
  * equality vs the real ladder is spec-asserted, and FuzzOnce generates
  * adversarial members/near-members of the class.
  */
object StrictRepair {

  private val BboxLit = "{\"bbox\":"

  /** Attempt the fused repair from an untagged-capture row: re-transcodes
    * in capture mode. None ⇒ caller must run the real ladder.
    */
  def attempt(text: String, scaleX: Double, scaleY: Double): Option[OutputCleaner.CleanResult] =
    try {
      StrictFast.transcodeCapture(text, scaleX, scaleY) match {
        case c: StrictFast.ParseFailTrailCaptured => fromCaptured(text, c)
        case _ => None // capture disagreed with the tag — never fuse
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fused repair from an already-captured first-pass transcode (ExtractTurn
    * runs big payloads in capture mode up front, so the class's dominant
    * >50k rows skip the second scan entirely).
    */
  def fromCaptured(text: String,
                   c: StrictFast.ParseFailTrailCaptured): Option[OutputCleaner.CleanResult] =
    try build(text, c.cells, c.bracketPos)
    catch { case scala.util.control.NonFatal(_) => None }

  private def build(text: String, cells: Vector[StrictFast.RepairCell],
                    bracketPos: Int): Option[OutputCleaner.CleanResult] = {
    val n = text.length
    // 1. trailer: `]` then Python-ws* then EOF
    if (bracketPos >= n || text.charAt(bracketPos) != ']') return None
    var p = bracketPos + 1
    while (p < n && Py.isSpace(text.charAt(p))) p += 1
    if (p != n) return None

    // 2. fix_missing_delimiters must be the identity (string-blind scan,
    // exactly the reference regex's view of the text)
    var q = text.indexOf('}')
    while (q >= 0) {
      var r = q + 1
      while (r < n && Py.isSpace(text.charAt(r))) r += 1
      if (r < n && text.charAt(r) == '{' && (r + 1 >= n || text.charAt(r + 1) != '"'))
        return None
      q = text.indexOf('}', q + 1)
    }

    // 3. braces only at cell boundaries (string-blind)
    var ci = 0
    q = text.indexOf('{')
    while (q >= 0) {
      if (ci >= cells.length || cells(ci).rawStart != q) return None
      ci += 1
      q = text.indexOf('{', q + 1)
    }
    if (ci != cells.length) return None
    ci = 0
    q = text.indexOf('}')
    while (q >= 0) {
      if (ci >= cells.length || cells(ci).rawEnd - 1 != q) return None
      ci += 1
      q = text.indexOf('}', q + 1)
    }
    if (ci != cells.length) return None

    // 4. no bbox extras
    if (cells.exists(_.bboxExtra)) return None

    // 5. per-cell block match ends exactly at the cell end
    if (!cells.forall(c => blockEnd(text, c.rawStart) == c.rawEnd - 1)) return None

    // ---- the ladder, resolved for this class ----
    var ops = CleanOps(opType = "str", originalLength = n) // delimiter_fixes = 0

    // truncate_last_incomplete_element: strip(text) ends with ']' (trailer
    // check), so only the length trigger can fire
    var kept = cells
    var truncated = false
    var s2Len = n
    if (n > 50000) {
      val bboxPositions = literalPositions(text)
      if (bboxPositions.length > 1) {
        val cut = bboxPositions.last
        if (cut > 0) {
          // 6. the cut must be a captured cell start…
          val j = cells.indexWhere(_.rawStart == cut)
          if (j < 0) return None
          // …and rstrip + one-comma-trim must land at cell j-1's end
          var e = cut
          while (e > 0 && Py.isSpace(text.charAt(e - 1))) e -= 1
          if (e > 0 && text.charAt(e - 1) == ',') e -= 1
          s2Len = e
          var e2 = e
          while (e2 > 0 && Py.isSpace(text.charAt(e2 - 1))) e2 -= 1
          if (j > 0) { if (e2 != cells(j - 1).rawEnd) return None }
          else if (e2 < 1 || text.charAt(e2 - 1) != '[') return None
          kept = cells.take(j)
          truncated = true
        } else return None // cut at 0: outside the proven shape
      }
    }
    ops = ops.copy(tailTruncated = truncated, truncatedLength = s2Len)

    // duplicate complete-dict dedup: blocks ≡ kept cell substrings (3+5),
    // first occurrence wins; a rebuild (dups>0) removes the trailing comma
    // so parse_final succeeds directly; with no dups the untruncated text
    // keeps its trailing comma and parse_final's per-block salvage returns
    // the same cells — identical either way
    val seen = scala.collection.mutable.HashSet.empty[String]
    var dups = 0
    val keptU = kept.filter { c =>
      if (seen.add(text.substring(c.rawStart, c.rawEnd))) true
      else { dups += 1; false }
    }
    ops = ops.copy(duplicateDictsRemoved = dups)

    // parse_final result: the kept cells as the tree parse would see them —
    // minimal reconstruction (bbox/category/text are the only keys the C9
    // tail and the md join read; raw-substring dedup above already used the
    // full source bytes)
    val data: Vector[JValue] = keptU.map { c =>
      var o = JObj(Vector.empty).put("bbox", JArr(c.bbox))
        .put("category", JStr(c.category))
      if (c.hasText) o = o.put("text", JStr(c.text))
      o: JValue
    }
    ops = ops.copy(finalObjects = data.length, success = true)
    Some(OutputCleaner.finishClean(Left(text), data, ops))
  }

  /** Mimics findDictBlocks' inner loop from a known `{` position: returns
    * the match-end index (the `}`), or -1. Kept verbatim-equivalent to
    * [[OutputCleaner.findDictBlocks]]'s acceptance so precondition 5 really
    * is the block the ladder would see.
    */
  private def blockEnd(text: String, start: Int): Int = {
    val n = text.length
    var p = start + 1
    while (p < n) {
      val c = text.charAt(p)
      if (c == '{' || c == '}') return -1
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
              while (t < n && text.charAt(t) != '}') {
                if (text.charAt(t) == '{') return -1
                t += 1
              }
              if (t < n) return t
            }
            return -1
          }
        }
      }
      p += 1
    }
    -1
  }

  /** All positions of the literal `{"bbox":` (string-blind indexOf sweep —
    * the same view Py.count/Py.rfind have in the truncation stage).
    */
  private def literalPositions(text: String): Vector[Int] = {
    val out = Vector.newBuilder[Int]
    var q = text.indexOf(BboxLit)
    while (q >= 0) {
      out += q
      q = text.indexOf(BboxLit, q + 1)
    }
    out.result()
  }
}
