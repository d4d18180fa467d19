package graft

/** One-off deep fuzz (not part of CI): run with
  * `Test/runMain graft.FuzzOnce <n>` — pits StrictFast against the tree
  * path on n random adversarial payloads.
  */
object FuzzOnce {
  def main(args: Array[String]): Unit = {
    import graft.json.{JArr, PyJson, StrictFast}
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val rnd = new scala.util.Random(20260816L)
    val origW = 1275; val origH = 1650
    val (ih, iw) = graft.geom.SmartResize.smartResize(origH, origW)
    val (ih2, iw2) = graft.geom.SmartResize.smartResize(ih, iw)
    val sx = iw2.toDouble / origW; val sy = ih2.toDouble / origH
    val scalars = Array("1", "-1", "0", "-0", "42", "1.5", "-0.0", "1e3", "1E-2",
      "123456789012345678901234567890", "9007199254740993", "NaN", "Infinity",
      "-Infinity", "true", "false", "null", "\"plain text\"",
      "\"esc\\n\\t\\\"q\\\" \\\\\"", "\"uni\\u00e9\\u001c\"", "\"sl\\/ash\"",
      "\"\\ud83d\\ude00\"", "\"\\u002b\\u0041\"", "\"日本語\"", "\"\"",
      "\"\\uZZZZ\"", "\"\\u+123\"", "\"\\q\"", "01", "- 1", "+1", "1.", ".5",
      "tru", "nul", "Na", "Inf")
    val coords = Array("1", "100", "-3", "2.5", "999.75", "0", "-0", "1e2",
      "\"12\"", "NaN", "[1]", "3000000000", "1e999", "Infinity",
      "12345678901234567890", "-Infinity", "{\"x\":1}", "")
    val wsArr = Array("", "", "", " ", "\n", "\t ", "\u001c")
    def ws() = wsArr(rnd.nextInt(wsArr.length))
    def value(d: Int): String =
      if (d <= 0 || rnd.nextInt(10) < 6) scalars(rnd.nextInt(scalars.length))
      else if (rnd.nextBoolean())
        (0 until rnd.nextInt(4)).map(_ => value(d - 1)).mkString("[", ",", "]")
      else
        (0 until rnd.nextInt(4)).map(_ =>
          "\"" + ("abk"(rnd.nextInt(3))) + "\":" + value(d - 1)).mkString("{", ",", "}")
    def cell(): String = {
      val fields = scala.collection.mutable.ArrayBuffer[String]()
      val nb = rnd.nextInt(7)
      val bbox = (0 until nb).map(_ => coords(rnd.nextInt(coords.length)))
        .mkString("[", ", ", "]")
      if (rnd.nextInt(10) > 0) fields += s""""bbox"${ws()}:${ws()}$bbox"""
      rnd.nextInt(5) match {
        case 0 => ()
        case 1 => fields += s""""category": 3"""
        case _ => fields += s""""category":${ws()}"Text""""
      }
      rnd.nextInt(4) match {
        case 0 => ()
        case 1 => fields += s""""text": 7"""
        case _ => fields += s""""text": "body\\nmore""""
      }
      if (rnd.nextInt(8) == 0) fields += s""""bbox": [1,2,3,4]""" // dup
      if (rnd.nextInt(4) == 0) fields += s""""meta" : ${value(2)}"""
      val body = fields.mkString("{", ", ", "}")
      if (rnd.nextInt(12) == 0) body.dropRight(1 + rnd.nextInt(3)) else body
    }
    var ok = 0; var pf = 0; var sf = 0; var bad = 0
    (0 until n).foreach { i =>
      val cells = (0 until rnd.nextInt(5)).map(_ => cell())
      val trailing = if (rnd.nextInt(5) == 0) "," else ""
      val tail = if (rnd.nextInt(6) == 0) "x" else ""
      val sep = if (rnd.nextInt(10) == 0) " " else ","
      val payload = s"${ws()}[${cells.mkString(sep)}$trailing]${ws()}$tail"
      StrictFast.transcode(payload, sx, sy) match {
        case StrictFast.ShapeFail => sf += 1
        case StrictFast.ParseFail =>
          pf += 1
          try { PyJson.parse(payload); bad += 1
            println(s"PARSEFAIL-BUT-PARSES: $payload") }
          catch { case _: Exception => () }
        case StrictFast.Ok(json, lean) =>
          ok += 1
          val items = PyJson.parse(payload).asInstanceOf[JArr].items
          val rescaled = graft.pipeline.ExtractTurn.postProcessCells(items, origW, origH, iw, ih)
          val expect = PyJson.dumps(JArr(rescaled), payload.length + 64)
          if (expect != json) { bad += 1
            println(s"MISMATCH:\n  in : $payload\n  old: $expect\n  new: $json") }
          if (rescaled.length != lean.length) { bad += 1
            println(s"LEANLEN: $payload") }
      }
    }
    println(s"FUZZ n=$n ok=$ok parsefail=$pf shapefail=$sf BAD=$bad")
    if (bad > 0) sys.exit(1)
  }
}
