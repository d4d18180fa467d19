package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("mm-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("decode is deterministic and stable under repartitioning") {
    val a = MultimodalOps.decodeAssets(MultimodalOps.assetsFromDocuments(docs))
      .collect().map(d => d.asset_id -> d).toMap
    val b = MultimodalOps.decodeAssets(
      MultimodalOps.assetsFromDocuments(docs).repartition(7))
      .collect().map(d => d.asset_id -> d).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (id, d) =>
      val e = b(id)
      assert((d.width, d.height, d.duration_ms, d.feature) ===
        ((e.width, e.height, e.duration_ms, e.feature)), s"asset $id")
    }
  }

  test("typed metadata respects media semantics; resize uses real smart_resize") {
    val dec = MultimodalOps.decodeAssets(MultimodalOps.assetsFromDocuments(docs)).collect()
    assert(dec.nonEmpty)
    dec.foreach { d =>
      d.media_type match {
        case "image" =>
          assert(d.duration_ms === 0L && d.frame_offsets_ms.isEmpty && d.width > 0)
        case "audio" =>
          assert(d.width === 0 && d.duration_ms > 0 && d.frame_offsets_ms.isEmpty)
        case "video" =>
          assert(d.width > 0 && d.duration_ms > 0)
          assert(d.frame_offsets_ms.length ===
            ((d.duration_ms + MultimodalOps.FrameEveryMs - 1) / MultimodalOps.FrameEveryMs))
      }
      if (d.width > 0) {
        val (rh, rw) = graft.geom.SmartResize.smartResize(d.height, d.width)
        assert((d.resized_width, d.resized_height) === ((rw, rh)))
        assert(rw % 28 === 0 && rh % 28 === 0)
      }
      assert(d.feature.length === MultimodalOps.FeatureDim)
      assert(d.n_bytes > 0)
    }
  }
}
