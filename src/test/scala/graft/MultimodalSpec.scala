package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{MediaRow, MediaFeatures}

class MultimodalSpec extends SparkSuite {

  private def media = {
    val s = spark
    import s.implicits._
    Seq(
      MediaRow(0L, "image", Array[Byte](10, 20, 30), "fake", 640, 480, 0L),
      MediaRow(1L, "audio", Array[Byte](-1, 1), "fake", 0, 0, 2000L),
      MediaRow(2L, "video", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), "fake", 1920, 1080, 3000L),
      MediaRow(3L, "image", Array.emptyByteArray, "fake", 10, 10, 0L)).toDS()
  }

  test("extractFeatures: deterministic stub stats, empty payload safe") {
    val f = MultimodalOps.extractFeatures(media, batchSize = 2).collect()
      .map(x => x.doc_id -> x).toMap
    assert(f(0L).n_bytes == 3 && f(0L).mean_byte == 20.0)
    assert(f(1L).mean_byte == (255 + 1) / 2.0) // unsigned byte semantics
    assert(f(3L).n_bytes == 0 && f(3L).mean_byte == 0.0)
    // determinism across batch sizes (batch boundary must not affect values)
    val g = MultimodalOps.extractFeatures(media, batchSize = 1).collect()
      .map(x => x.doc_id -> x.checksum).toMap
    assert(f.view.mapValues(_.checksum).toMap == g)
  }

  test("resizeMeta scales the long edge to maxDim, never upscales") {
    val out = MultimodalOps.resizeMeta(media.toDF(), 256).collect()
      .map(r => r.getLong(0) -> (r.getInt(7), r.getInt(8))).toMap
    assert(out(0L) == (256, 192))   // 640x480 → 256x192
    assert(out(2L) == (256, 144))   // 1920x1080 → 256x144
    assert(out(3L) == (10, 10))     // already small: untouched
  }

  test("sampleFrames: one row per everyMs for videos only") {
    val frames = MultimodalOps.sampleFrames(media, 1000L).collect()
    assert(frames.forall(_.doc_id == 2L))
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2))
    assert(frames.forall(_.payload.length <= 4))
  }

  test("syntheticMedia: 16-byte md5 payload, modality round-robin") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "hello", 5L), (1L, "world", 5L), (2L, "!", 1L))
      .toDF("doc_id", "text", "n_chars")
    val m = MultimodalOps.syntheticMedia(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getAs[Array[Byte]](2).length)).toMap
    assert(m(0L) == ("image", 16) && m(1L) == ("audio", 16) && m(2L) == ("video", 16))
  }
}
