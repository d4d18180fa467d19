package graft.pipeline

import graft.json.{JArr, JInt, JObj, JStr, JValue, PyJson}

/** Canonical JSON rendering of span offsets — byte-identical to the fixture
  * generator's `json.dumps(spans, ensure_ascii=False)`.
  */
object ResultJson {
  def spansJson(spans: Seq[SpanRow]): String =
    PyJson.dumps(JArr(spans.toVector.map { s =>
      JObj(Vector(
        "cell_idx" -> (JInt(s.cell_idx): JValue),
        "category" -> JStr(s.category),
        "start" -> JInt(s.start),
        "end" -> JInt(s.end)))
    }))
}
