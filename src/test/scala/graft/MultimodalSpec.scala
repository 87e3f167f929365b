package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  private def docs(text: String) = {
    import spark.implicits._
    Seq((1L, text, "en", "s0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("attachBinary produces an opaque payload with correct byte metadata") {
    val out = Multimodal.attachBinary(docs("abcd")).collect().head
    assert(out.getAs[Array[Byte]]("payload").toSeq == "abcd".getBytes("UTF-8").toSeq)
    assert(out.getAs[String]("format") == "utf8-text")
    assert(out.getAs[Long]("byte_len") == 4L)
  }

  test("fakeDecodeFeatures: deterministic 16-bin normalized byte histogram") {
    import spark.implicits._
    val media = Multimodal.attachBinary(docs("aaab")).as[Multimodal.Media]
    val f = Multimodal.fakeDecodeFeatures(media).collect().head.getSeq[Float](1)
    assert(f.length == 16)
    // 'a'=97 → bin 1; 'b'=98 → bin 2; 3/4 and 1/4
    assert(f(1) == 0.75f && f(2) == 0.25f)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
  }

  test("resizeFeatures pads with zeros and truncates") {
    import spark.implicits._
    val media = Multimodal.attachBinary(docs("aaab")).as[Multimodal.Media]
    val feats = Multimodal.fakeDecodeFeatures(media)
    assert(Multimodal.resizeFeatures(feats, 4).collect().head.getSeq[Float](1).length == 4)
    val padded = Multimodal.resizeFeatures(feats, 20).collect().head.getSeq[Float](1)
    assert(padded.length == 20 && padded(19) == 0.0f)
  }

  test("frameSample keeps every step-th fixed-size frame") {
    val df = Multimodal.attachBinary(docs("x" * 300)) // 300 bytes, 64-byte frames → 5 frames
    val out = Multimodal.frameSample(df, 64, 2).collect().head
    assert(out.getAs[Long]("n_frames") == 5L)
    val sampled = out.getSeq[Array[Byte]](out.fieldIndex("sampled_frames"))
    assert(sampled.length == 3) // frames 0, 2, 4
    assert(sampled(0).length == 64 && sampled(2).length == 300 - 4 * 64)
  }

  test("binaryFile ingestion: glob prunes at listing, bytes arrive opaque and typed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    val payloads = Map(7L -> Array[Byte](1, 2, 3, 4), 12L -> Array[Byte](9, 8))
    payloads.foreach { case (id, bytes) =>
      java.nio.file.Files.write(dir.resolve(s"img_$id.jpg"), bytes)
    }
    java.nio.file.Files.write(dir.resolve("notes.txt"), Array[Byte](0))

    val files = Multimodal.readBinaryDir(spark, dir.toString, "*.jpg")
    assert(files.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val media = Multimodal.mediaFromFiles(files).collect()
      .map(m => m.doc_id -> m).toMap
    assert(media.keySet == Set(7L, 12L)) // .txt pruned by the glob
    assert(media(7L).payload.toSeq == Seq[Byte](1, 2, 3, 4))
    assert(media(7L).format == "jpg" && media(7L).byte_len == 4L)
    // and the ingested Dataset[Media] feeds the decode pipeline directly
    val feats = Multimodal.fakeDecodeFeatures(
      Multimodal.mediaFromFiles(files)).collect()
    assert(feats.length == 2)
  }
}
