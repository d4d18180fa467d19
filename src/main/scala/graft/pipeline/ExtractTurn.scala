package graft.pipeline

import graft.clean.{CleanOps, OutputCleaner}
import graft.geom.SmartResize
import graft.json.{JArr, JBig, JBool, JInt, JNull, JNum, JObj, JStr, JValue, PyJson}
import graft.render.FormatTransformer
import graft.text.Py

/** Input projection of the authoritative transcript shape (BASELINE.json
  * input_hint). `ts` is deliberately NOT read: the per-turn transform never
  * uses it, and pruning it keeps timestamp decoding out of the scan
  * (column pruning down to the parquet reader — SURVEY §4).
  */
final case class Turn(conv_id: String, turn_idx: Int, role: String,
                      text: String, tool: String)

final case class SpanRow(cell_idx: Int, category: String, start: Int, end: Int)

/** Per-row lineage record (A1 in SURVEY §2.7). */
final case class CleanOpsRow(
    op_type: String, original_count: Int, bbox_fixes: Int, removed_items: Int,
    final_count: Int, original_length: Int, delimiter_fixes: Int,
    tail_truncated: Boolean, truncated_length: Int, duplicate_dicts_removed: Int,
    final_objects: Int, pair_dedup_removed: Int, clean_success: Boolean)

object CleanOpsRow {
  def from(o: CleanOps): CleanOpsRow = CleanOpsRow(
    o.opType, o.originalCount, o.bboxFixes, o.removedItems, o.finalCount,
    o.originalLength, o.delimiterFixes, o.tailTruncated, o.truncatedLength,
    o.duplicateDictsRemoved, o.finalObjects, o.pairDedupRemoved, o.success)
}

/** One page/turn's extraction result — the reference's page-result record
  * (dots_ocr/parser.py:172-237) re-expressed as a table row.
  */
final case class TurnResult(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    orig_width: Int,
    orig_height: Int,
    input_width: Int,
    input_height: Int,
    cells_json: Option[String],
    md: Option[String],
    md_nohf: Option[String],
    filtered: Boolean,
    status: String,            // 'ok' | 'error' (Q4: error rows carried, never dropped)
    error_reason: Option[String],
    spans: Seq[SpanRow],
    clean_ops: CleanOpsRow)

/** Deterministic synthetic page geometry: the reference derives page pixel
  * dims from rasterization (dots_ocr/utils/doc_utils.py:20-39); our corpus
  * has no pixels, so (orig_w, orig_h) is a pure function of (conv_id,
  * turn_idx) shared verbatim with the fixture generator (FIXTURES.md §2).
  * FNV-1a 64 over UTF-8 of "convId#turnIdx" selects from a shape table that
  * covers every smart_resize branch including banker's-rounding ties.
  */
object PageGeom {
  // (height, width) pairs — see tools/gen_fixtures.py SHAPES (must match).
  val Shapes: Array[(Int, Int)] = Array(
    (1650, 1275),  // US-letter-ish
    (3508, 2480),  // A4 @300dpi
    (1754, 1240),  // A4 @150dpi
    (600, 800),
    (2160, 3840),
    (3000, 4500),  // > max_pixels → downscale branch
    (40, 30),      // < min_pixels → upscale branch
    (21, 50),      // < min_pixels
    (2800, 5000),  // > max_pixels
    (1000, 1000),
    (480, 640),
    (28, 28),      // exactly one factor
    (1274, 1246),  // 45.5/44.5 ties — banker's-rounding witnesses
    (14, 2591),    // aspect 185 (near the 200 guard), h rounds to 0 → max(factor,·)
    (500, 706),
    (3210, 2140)
  )

  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Returns (origHeight, origWidth). */
  def of(convId: String, turnIdx: Int): (Int, Int) = {
    val h = fnv1a64(s"$convId#$turnIdx")
    val idx = java.lang.Long.remainderUnsigned(h, Shapes.length.toLong).toInt
    Shapes(idx)
  }
}

/** The per-turn transform: strict parse (C1) → repair ladder (C10) → bbox
  * rescale (P7) → markdown render (R1/R2) with header/footer filter (F1) and
  * span offsets (R3). Mirrors dots_ocr/parser.py:143-253 +
  * layout_utils.py:202-228 minus the VLM/pixel boundary.
  */
object ExtractTurn {

  val LayoutModes: Set[String] =
    Set("prompt_layout_all_en", "prompt_layout_only_en", "prompt_grounding_ocr")

  private final class KeyErrorLike(msg: String) extends RuntimeException(msg)

  /** Kill switch for the fused strict path (-Dgraft.strictfast=off):
    * operational escape hatch + same-JVM A/B benchmarking (host capacity
    * drifts too much for cross-run comparison).
    */
  @volatile private[graft] var strictFastEnabled: Boolean =
    !sys.props.get("graft.strictfast").contains("off")

  /** Kill switch for the fused repair-ladder path
    * (-Dgraft.strictrepair=off): falls back to the real ladder for the
    * trailing-comma class.
    */
  @volatile private[graft] var strictRepairEnabled: Boolean =
    !sys.props.get("graft.strictrepair").contains("off")

  /** Python float(x) for the values a bbox coordinate can hold. */
  private def pyFloat(v: JValue): Double = v match {
    case JInt(i)  => i.toDouble
    case JBig(i)  => i.toDouble
    case JNum(d)  => d
    case JBool(b) => if (b) 1.0 else 0.0
    case JStr(s0) =>
      val s = Py.strip(s0)
      val low = s.toLowerCase
      if (low == "inf" || low == "infinity" || low == "+inf" || low == "+infinity") Double.PositiveInfinity
      else if (low == "-inf" || low == "-infinity") Double.NegativeInfinity
      else if (low == "nan" || low == "+nan" || low == "-nan") Double.NaN
      else if (s.matches("""[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?""")) s.toDouble
      else throw new NumberFormatException(s0)
    case other => throw new KeyErrorLike(s"float() of $other")
  }

  /** layout_utils.py:146-193 `post_process_cells` — exact port, including the
    * looser checks CPython performs (only cells[0] is type-checked; later
    * non-dict or malformed cells throw, diverting the page to the repair
    * path). `int(float(x)/scale)` truncates toward zero.
    */
  def postProcessCells(cells: Vector[JValue], origW: Int, origH: Int,
                       inputW: Int, inputH: Int): Vector[JValue] = {
    if (cells.isEmpty || !cells.head.isInstanceOf[JObj])
      throw new KeyErrorLike("assert cells")
    val (ih, iw) = SmartResize.smartResize(inputH, inputW)
    val scaleX = iw.toDouble / origW
    val scaleY = ih.toDouble / origH
    cells.map { cv =>
      val cell = cv match {
        case o: JObj => o
        case other   => throw new KeyErrorLike(s"cell['bbox'] on $other")
      }
      val bbox = cell.get("bbox").getOrElse(throw new KeyErrorLike("bbox"))
      var c0 = 0.0; var c1 = 0.0; var c2 = 0.0; var c3 = 0.0
      bbox match {
        case JArr(items) =>
          if (items.length < 4) {
            // Python indexes bbox[0..3]; fewer elements → IndexError
            throw new KeyErrorLike("bbox IndexError")
          }
          c0 = pyFloat(items(0)); c1 = pyFloat(items(1))
          c2 = pyFloat(items(2)); c3 = pyFloat(items(3))
        case JStr(s) =>
          // CPython quirk: a string bbox is indexable; float(char) must parse
          if (s.length < 4) throw new KeyErrorLike("bbox IndexError")
          c0 = pyFloat(JStr(s.charAt(0).toString)); c1 = pyFloat(JStr(s.charAt(1).toString))
          c2 = pyFloat(JStr(s.charAt(2).toString)); c3 = pyFloat(JStr(s.charAt(3).toString))
        case other => throw new KeyErrorLike(s"bbox not indexable: $other")
      }
      val rescaled = JArr(Vector[JValue](
        JInt(SmartResize.scaleCoord(c0, scaleX)),
        JInt(SmartResize.scaleCoord(c1, scaleY)),
        JInt(SmartResize.scaleCoord(c2, scaleX)),
        JInt(SmartResize.scaleCoord(c3, scaleY))))
      cell.put("bbox", rescaled) // in-place key position, like dict copy+assign
    }
  }

  /** Python repr() of a parsed-JSON value: containers render recursively
    * with single-quoted string repr — what str(dict)/str(list) produces.
    */
  private def pyRepr(v: JValue): String = v match {
    case JStr(s)  => Py.reprStr(s)
    case JInt(i)  => i.toString
    case JBig(i)  => i.toString
    case JNum(d)  => Py.floatRepr(d)
    case JBool(b) => if (b) "True" else "False"
    case JNull    => "None"
    case JArr(xs) => xs.map(pyRepr).mkString("[", ", ", "]")
    case JObj(es) => es.map { case (k, x) => Py.reprStr(k) + ": " + pyRepr(x) }
      .mkString("{", ", ", "}")
  }

  /** Python str() of a parsed-JSON value (the repair ladder stringifies
    * whatever json.loads produced when it isn't a list,
    * output_cleaner.py:424): scalars via str(), containers via repr —
    * so a bare-dict model response flows into the string ladder and ends
    * as filtered=True, md="" exactly like the reference.
    */
  private def pyStr(v: JValue): String = v match {
    case JStr(s)  => s
    case JInt(i)  => i.toString
    case JBig(i)  => i.toString
    case JNum(d)  => Py.floatRepr(d)
    case JBool(b) => if (b) "True" else "False"
    case JNull    => "None"
    case container => pyRepr(container)
  }

  /** layout_utils.py:202-228 + parser.py:178-251, for one turn. */
  def apply(t: Turn): TurnResult = {
    val (origH, origW) = PageGeom.of(t.conv_id, t.turn_idx)
    try {
      val (ih, iw) = SmartResize.smartResize(origH, origW)
      if (!LayoutModes.contains(t.tool)) {
        // parser.py:238-251 — raw response becomes the markdown
        TurnResult(t.conv_id, t.turn_idx, t.role, t.tool, origW, origH, iw, ih,
          cells_json = None, md = Some(t.text), md_nohf = None,
          filtered = false, status = "ok", error_reason = None,
          spans = Nil, clean_ops = CleanOpsRow.from(CleanOps.none))
      } else {
        // C1 strict parse + P7 rescale, FUSED fast path first
        // (graft.json.StrictFast): one pass, no JValue tree, byte-identical
        // output for the common shape; anything unusual falls back to the
        // tree path below, which replays from the raw text — so
        // classification (strict/repair/error) and bytes are unchanged by
        // construction
        import graft.json.StrictFast
        val fast: StrictFast.Result = if (strictFastEnabled) {
          val (ih2, iw2) = SmartResize.smartResize(ih, iw)
          // big payloads transcode in capture mode up front: strict ones are
          // rare at this size, and a trailing-comma bail then feeds
          // StrictRepair without a second 50KB+ scan
          if (t.text.length > 10000 && strictRepairEnabled)
            StrictFast.transcodeCapture(
              t.text, iw2.toDouble / origW, ih2.toDouble / origH)
          else StrictFast.transcode(
            t.text, iw2.toDouble / origW, ih2.toDouble / origH)
        } else StrictFast.ShapeFail
        fast match {
          case StrictFast.Ok(cellsJson, lean) =>
            return (if (t.tool == "prompt_layout_only_en") {
              TurnResult(t.conv_id, t.turn_idx, t.role, t.tool, origW, origH, iw, ih,
                cells_json = Some(cellsJson), md = None, md_nohf = None,
                filtered = false, status = "ok", error_reason = None,
                spans = Nil, clean_ops = CleanOpsRow.from(CleanOps.none))
            } else {
              val (md, spans, mdNohf) = FormatTransformer.layoutJsonToMdBothLean(lean)
              TurnResult(t.conv_id, t.turn_idx, t.role, t.tool, origW, origH, iw, ih,
                cells_json = Some(cellsJson), md = Some(md), md_nohf = Some(mdNohf),
                filtered = false, status = "ok", error_reason = None,
                spans = spans.map(s => SpanRow(s.cellIdx, s.category, s.start, s.end)),
                clean_ops = CleanOpsRow.from(CleanOps.none))
            })
          case _ => () // tree path below
        }

        var parsed: Option[JValue] = None
        val strictResult: Option[Vector[JValue]] =
          // ParseFail (and its trailing-comma-tagged variants) is the
          // transcoder's GUARANTEE that PyJson.parse throws on this text
          // (same grammar, spec-asserted) — skip the redundant tree parse
          // so repair rows pay only ONE scan before the ladder
          if ((fast eq StrictFast.ParseFail) || (fast eq StrictFast.ParseFailTrail) ||
            fast.isInstanceOf[StrictFast.ParseFailTrailCaptured]) None
          else try {
            val v = PyJson.parse(t.text)
            parsed = Some(v)
            val items = v match {
              case JArr(xs) => xs
              case _        => throw new KeyErrorLike("not a list")
            }
            Some(postProcessCells(items, origW, origH, iw, ih))
          } catch { case _: Exception => None }

        strictResult match {
          case Some(rescaled) =>
            val cellsJson = PyJson.dumps(JArr(rescaled), t.text.length + 64)
            if (t.tool == "prompt_layout_only_en") {
              TurnResult(t.conv_id, t.turn_idx, t.role, t.tool, origW, origH, iw, ih,
                cells_json = Some(cellsJson), md = None, md_nohf = None,
                filtered = false, status = "ok", error_reason = None,
                spans = Nil, clean_ops = CleanOpsRow.from(CleanOps.none))
            } else {
              val (md, spans, mdNohf) = FormatTransformer.layoutJsonToMdBoth(rescaled)
              TurnResult(t.conv_id, t.turn_idx, t.role, t.tool, origW, origH, iw, ih,
                cells_json = Some(cellsJson), md = Some(md), md_nohf = Some(mdNohf),
                filtered = false, status = "ok", error_reason = None,
                spans = spans.map(s => SpanRow(s.cellIdx, s.category, s.start, s.end)),
                clean_ops = CleanOpsRow.from(CleanOps.none))
            }

          case None =>
            // repair path (layout_utils.py:219-228): clean_model_output gets
            // the parsed list if json.loads succeeded with a list, else the
            // str() of whatever `cells` holds.
            val cleanerInput: Either[String, Vector[JValue]] = parsed match {
              case Some(JArr(xs)) => Right(xs)
              case Some(other)    => Left(pyStr(other))
              case None           => Left(t.text)
            }
            // fused repair for the trailing-comma class: the captured (or
            // one re-captured) scan replaces the ladder's raw-text rescans;
            // None (any class precondition unmet) replays the real ladder —
            // always safe
            val res = (fast match {
              case c: StrictFast.ParseFailTrailCaptured if strictRepairEnabled =>
                graft.clean.StrictRepair.fromCaptured(t.text, c)
              case f if (f eq StrictFast.ParseFailTrail) && strictRepairEnabled =>
                val (ih2, iw2) = SmartResize.smartResize(ih, iw)
                graft.clean.StrictRepair.attempt(
                  t.text, iw2.toDouble / origW, ih2.toDouble / origH)
              case _ => None
            }).getOrElse(OutputCleaner.cleanModelOutput(cleanerInput))
            val joined: String = res.cleaned match {
              case Right(list) =>
                list.collect {
                  case o: JObj if o.contains("text") =>
                    o.get("text").get match {
                      case JStr(s) => s
                      case other   => throw new KeyErrorLike(s"join non-str: $other")
                    }
                }.mkString("\n\n")
              case Left(original) => original
            }
            if (t.tool == "prompt_layout_only_en") {
              // parser.py:187 condition excludes layout_only from the filtered
              // branch → falls into the normal branch where `cells` is the
              // cleaned STRING; json.dump writes it as a JSON string literal
              // and no markdown is emitted.
              TurnResult(t.conv_id, t.turn_idx, t.role, t.tool, origW, origH, iw, ih,
                cells_json = Some(PyJson.dumps(JStr(joined))), md = None, md_nohf = None,
                filtered = true, status = "ok", error_reason = None,
                spans = Nil, clean_ops = CleanOpsRow.from(res.ops))
            } else {
              // parser.py:188-207 — raw response json-dumped; cleaned text as md
              TurnResult(t.conv_id, t.turn_idx, t.role, t.tool, origW, origH, iw, ih,
                cells_json = Some(PyJson.dumps(JStr(t.text))), md = Some(joined),
                md_nohf = None, filtered = true, status = "ok", error_reason = None,
                spans = Nil, clean_ops = CleanOpsRow.from(res.ops))
            }
        }
      }
    } catch {
      case e: Exception =>
        // F3/F4/Q4: never drop a row — error rows carry reason for re-parse
        TurnResult(t.conv_id, t.turn_idx, t.role, t.tool, origW, origH, 0, 0,
          cells_json = None, md = None, md_nohf = None,
          filtered = true, status = "error",
          error_reason = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}"),
          spans = Nil, clean_ops = CleanOpsRow.from(CleanOps.none.copy(success = false)))
    }
  }
}
