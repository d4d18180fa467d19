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
    var ok = 0; var pf = 0; var sf = 0; var bad = 0; var trail = 0
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
        case StrictFast.ParseFailTrail =>
          pf += 1; trail += 1
          try { PyJson.parse(payload); bad += 1
            println(s"TRAIL-BUT-PARSES: $payload") }
          catch { case _: Exception => () }
          // full repair-path equality: fused ladder == real ladder
          val turn = graft.pipeline.Turn("fuzz-conv", 1, "assistant", payload,
            "prompt_layout_all_en")
          graft.pipeline.ExtractTurn.strictRepairEnabled = true
          val a = graft.pipeline.ExtractTurn.apply(turn)
          graft.pipeline.ExtractTurn.strictRepairEnabled = false
          val b = graft.pipeline.ExtractTurn.apply(turn)
          graft.pipeline.ExtractTurn.strictRepairEnabled = true
          if (a != b) { bad += 1
            println(s"REPAIR-MISMATCH:\n  in : $payload\n  fused: $a\n  ladder: $b") }
        case StrictFast.ParseFailTrailCaptured(_, _) =>
          bad += 1; println(s"CAPTURED-FROM-PLAIN-TRANSCODE: $payload")
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
    // second sweep: biased INTO the trailing-comma class (strict-ish cells
    // + trailing comma) so StrictRepair itself gets adversarial density —
    // the generic generator above lands there only ~0.03% of the time
    val strTexts = Array("\"a\"", "\"\"", "\"x{y\"", "\"} {\"", "\"}{\"",
      "\"has \\\"bbox\\\": inside\"", "\"bbox\"", "\"a}b\"", "\"l\\nb\"",
      "\"cat\"", "\"{\\\"bbox\\\":\"", "\"日本語\"")
    val coordPool = Array("1", "2.5", "-3", "100", "0", "1e2")
    val metaPool = Array("[1]", "7", "\"v\"", "{\"k\": 1}")
    def strictCell(): String = {
      val c = (0 until 4).map(_ => coordPool(rnd.nextInt(coordPool.length)))
      val extra = if (rnd.nextInt(8) == 0) ", 9" else ""
      val bbox = s""""bbox":${ws()}[${c.mkString(", ")}$extra]"""
      val cat = s""""category": "Text""""
      val txt = if (rnd.nextInt(5) == 0) "" else s""", "text": ${strTexts(rnd.nextInt(strTexts.length))}"""
      val meta = if (rnd.nextInt(6) == 0) s""", "m": ${metaPool(rnd.nextInt(metaPool.length))}""" else ""
      if (rnd.nextInt(2) == 0) s"{$bbox, $cat$txt$meta}" else s"{$cat, $bbox$txt$meta}"
    }
    var trail2 = 0
    (0 until n / 2).foreach { _ =>
      val k = 1 + rnd.nextInt(5)
      val cells0 = (0 until k).map(_ => strictCell())
      val cells = if (rnd.nextInt(4) == 0) cells0 :+ cells0(rnd.nextInt(k)) else cells0
      val trailerPool = Array(",", ", ", " ,", ",\n")
      val sepPool = Array(",", ",\n", " , ")
      val trailer = trailerPool(rnd.nextInt(trailerPool.length))
      val payload = s"[${cells.mkString(sepPool(rnd.nextInt(sepPool.length)))}$trailer]${ws()}"
      if (StrictFast.transcode(payload, sx, sy) == StrictFast.ParseFailTrail) {
        trail2 += 1
        val turn = graft.pipeline.Turn("fuzz2-conv", 1, "assistant", payload,
          "prompt_layout_all_en")
        graft.pipeline.ExtractTurn.strictRepairEnabled = true
        val a = graft.pipeline.ExtractTurn.apply(turn)
        graft.pipeline.ExtractTurn.strictRepairEnabled = false
        val b = graft.pipeline.ExtractTurn.apply(turn)
        graft.pipeline.ExtractTurn.strictRepairEnabled = true
        if (a != b) { bad += 1
          println(s"REPAIR-MISMATCH-2:\n  in : $payload\n  fused: $a\n  ladder: $b") }
      }
    }
    println(s"FUZZ n=$n ok=$ok parsefail=$pf (trail=$trail) shapefail=$sf trail2=$trail2 BAD=$bad")
    if (bad > 0) sys.exit(1)
  }
}
