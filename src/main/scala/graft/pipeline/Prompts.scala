package graft.pipeline

import graft.geom.SmartResize

/** Prompt-mode surface (P14/P15 in SURVEY §2.2).
  *
  * Prompt texts are the contract constants from
  * dots_ocr/utils/prompts.py:1-46; grounding mode appends the preprocessed
  * bbox rendered like Python's `str(list)` (comma+space — SURVEY §7.4.6).
  */
object Prompts {

  val dictPromptModeToPrompt: Map[String, String] = Map(
    "prompt_layout_all_en" ->
      """Please output the layout information from the PDF image, including each layout element's bbox, its category, and the corresponding text content within the bbox.

1. Bbox format: [x1, y1, x2, y2]

2. Layout Categories: The possible categories are ['Caption', 'Footnote', 'Formula', 'List-item', 'Page-footer', 'Page-header', 'Picture', 'Section-header', 'Table', 'Text', 'Title'].

3. Text Extraction & Formatting Rules:
    - Picture: For the 'Picture' category, the text field should be omitted.
    - Formula: Format its text as LaTeX.
    - Table: Format its text as HTML.
    - All Others (Text, Title, etc.): Format their text as Markdown.

4. Constraints:
    - The output text must be the original text from the image, with no translation.
    - All layout elements must be sorted according to human reading order.

5. Final Output: The entire output must be a single JSON object.
""",
    "prompt_layout_only_en" ->
      """Please output the layout information from this PDF image, including each layout's bbox and its category. The bbox should be in the format [x1, y1, x2, y2]. The layout categories for the PDF document include ['Caption', 'Footnote', 'Formula', 'List-item', 'Page-footer', 'Page-header', 'Picture', 'Section-header', 'Table', 'Text', 'Title']. Do not output the corresponding text. The layout result should be in JSON format.""",
    "prompt_ocr" -> """Extract the text content from this image.""",
    "prompt_grounding_ocr" ->
      "Extract text from the given bounding box on the image (format: [x1, y1, x2, y2]).\nBounding Box:\n",
    "prompt_web_parsing" -> "Parsing the layout info of this webpage image with format json:\n",
    "prompt_scene_spotting" -> """Detect and recognize the text in the image.""",
    "prompt_image_to_svg" ->
      "Please generate the SVG code based on the image.viewBox=\"0 0 {width} {height}\"",
    "prompt_general" -> " "
  )

  /** The 11-value category enum (dots_ocr/utils/prompts.py:7). */
  val Categories: Set[String] = Set("Caption", "Footnote", "Formula",
    "List-item", "Page-footer", "Page-header", "Picture", "Section-header",
    "Table", "Text", "Title")

  /** layout_utils.py:115-144 `pre_process_bboxes` — original→resized input
    * space, `int(float(coord)/scale)` truncation (the forward direction of
    * P7's inverse).
    */
  def preProcessBbox(bbox: Array[Int], origW: Int, origH: Int,
                     inputW: Int, inputH: Int): Array[Int] = {
    val (ih, iw) = SmartResize.smartResize(inputH, inputW)
    val scaleX = origW.toDouble / iw
    val scaleY = origH.toDouble / ih
    Array(
      SmartResize.scaleCoord(bbox(0).toDouble, scaleX),
      SmartResize.scaleCoord(bbox(1).toDouble, scaleY),
      SmartResize.scaleCoord(bbox(2).toDouble, scaleX),
      SmartResize.scaleCoord(bbox(3).toDouble, scaleY))
  }

  /** Deterministic per-turn grounding bbox in ORIGINAL image space — the
    * transcript table carries no bbox column, so the fixture contract derives
    * one from (conv_id, turn_idx) exactly like tools/gen_fixtures.py gbox():
    * four 16-bit slices of fnv1a64("conv#turn#gbox") pick origin and size.
    */
  def groundingBbox(convId: String, turnIdx: Int, origW: Int, origH: Int): Array[Int] = {
    val h = PageGeom.fnv1a64(s"$convId#$turnIdx#gbox")
    val a = ((h >>> 0) & 0xffff).toInt
    val b = ((h >>> 16) & 0xffff).toInt
    val c = ((h >>> 32) & 0xffff).toInt
    val d = ((h >>> 48) & 0xffff).toInt
    val x1 = a % math.max(1, origW - 40)
    val y1 = b % math.max(1, origH - 40)
    Array(x1, y1, x1 + 10 + c % 400, y1 + 10 + d % 200)
  }

  /** parser.py:133-140 `get_prompt` — grounding mode appends Python
    * `str([x1, y1, x2, y2])`.
    */
  def getPrompt(promptMode: String, bbox: Option[Array[Int]],
                origW: Int, origH: Int, inputW: Int, inputH: Int): String = {
    val prompt = dictPromptModeToPrompt(promptMode)
    if (promptMode == "prompt_grounding_ocr") {
      val b = bbox.getOrElse(throw new IllegalArgumentException("bbox required"))
      val pre = preProcessBbox(b, origW, origH, inputW, inputH)
      prompt + pre.mkString("[", ", ", "]")
    } else prompt
  }

  /** layout_utils.py:195-200 `is_legal_bbox` (F2). */
  def isLegalBbox(cells: Seq[Array[Int]]): Boolean =
    cells.forall(b => b(2) > b(0) && b(3) > b(1))

  /** demo/demo_gradio_batch.py:178-193 transient-error classifier (F6):
    * substring match on retryable error keywords; retained as the
    * error-lineage classifier for Q3/Q4 retry bookkeeping.
    */
  private val TransientKeywords = Seq("timeout", "timed out", "connection",
    "refused", "reset", "unavailable", "temporarily", "busy", "overloaded",
    "rate limit")

  def isTransientError(message: String): Boolean = {
    val m = message.toLowerCase
    TransientKeywords.exists(m.contains)
  }
}
