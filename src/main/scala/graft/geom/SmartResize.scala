package graft.geom

/** Image-geometry math ported exactly from the reference.
  *
  * `smart_resize` (dots_ocr/utils/image_utils.py:29-63, constants
  * dots_ocr/utils/consts.py:1-3) decides the model-input dimensions for every
  * page; every bbox in the output is rescaled through it, so the rounding
  * rules must match CPython bit-for-bit:
  *  - `round()` is banker's rounding (half-to-even) → `math.rint`, not
  *    `math.round` (SURVEY.md §7.4.1);
  *  - `int(float(x) / scale)` truncates toward zero → `.toInt` on Double
  *    (SURVEY.md §7.4.2).
  */
object SmartResize {
  val Factor = 28          // dots_ocr/utils/consts.py:3 IMAGE_FACTOR
  val MinPixels = 3136     // consts.py:1
  val MaxPixels = 11289600 // consts.py:2

  /** dots_ocr/utils/image_utils.py:14-16 — Python round() = half-to-even. */
  def roundByFactor(number: Double, factor: Int): Long =
    math.rint(number / factor).toLong * factor

  /** image_utils.py:19-21 */
  def ceilByFactor(number: Double, factor: Int): Long =
    math.ceil(number / factor).toLong * factor

  /** image_utils.py:24-26 */
  def floorByFactor(number: Double, factor: Int): Long =
    math.floor(number / factor).toLong * factor

  final case class AspectRatioError(ratio: Double)
      extends IllegalArgumentException(
        s"absolute aspect ratio must be smaller than 200, got $ratio")

  /** image_utils.py:29-63. Returns (hBar, wBar); throws AspectRatioError when
    * max/min > 200 (F3 in SURVEY §2.3).
    */
  def smartResize(height: Int, width: Int, factor: Int = Factor,
                  minPixels: Int = MinPixels, maxPixels: Int = MaxPixels): (Int, Int) = {
    val mx = math.max(height, width).toDouble
    val mn = math.min(height, width).toDouble
    if (mx / mn > 200) throw AspectRatioError(mx / mn)
    var hBar = math.max(factor.toLong, roundByFactor(height.toDouble, factor))
    var wBar = math.max(factor.toLong, roundByFactor(width.toDouble, factor))
    if (hBar * wBar > maxPixels) {
      val beta = math.sqrt((height.toDouble * width.toDouble) / maxPixels)
      hBar = math.max(factor.toLong, floorByFactor(height / beta, factor))
      wBar = math.max(factor.toLong, floorByFactor(width / beta, factor))
    } else if (hBar * wBar < minPixels) {
      val beta = math.sqrt(minPixels / (height.toDouble * width.toDouble))
      hBar = ceilByFactor(height * beta, factor)
      wBar = ceilByFactor(width * beta, factor)
      if (hBar * wBar > maxPixels) { // max_pixels re-check, image_utils.py:59-62
        val beta2 = math.sqrt((hBar * wBar).toDouble / maxPixels)
        hBar = math.max(factor.toLong, floorByFactor(hBar / beta2, factor))
        wBar = math.max(factor.toLong, floorByFactor(wBar / beta2, factor))
      }
    }
    (hBar.toInt, wBar.toInt)
  }

  /** Bbox rescale used by both directions (layout_utils.py:136-141,183-188):
    * `int(float(coord) / scale)` — truncation toward zero.
    */
  def scaleCoord(coord: Double, scale: Double): Int = (coord / scale).toInt
}
