package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Image payloads decode for real (JDK javax.imageio, header-only);
  * unrecognized payloads fall through to the declared stub. The rest pins
  * the plumbing — schema, batched partition-parallel extraction,
  * deterministic per-record features.
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def pngBytes(w: Int, h: Int, imageType: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imageType)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("extractFeatures: executor-side features over binary payloads") {
    import spark.implicits._
    val recs = Seq(
      Multimodal.MediaRecord(1L, "hello".getBytes("UTF-8")),
      Multimodal.MediaRecord(2L, Array.emptyByteArray))
      .toDS()
    val out = Multimodal.extractFeatures(recs).collect()
      .sortBy(_.doc_id)
    assert(out.length == 2)
    val h = out(0)
    assert(h.n_bytes == 5L)
    assert(h.content_hash == "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(h.width == 32L + 5 % 224)
    assert(h.height == 32L + (5 * 7) % 224)
    assert(h.channels == 1L) // md5("hello") first nibble 5 < 8
    assert(out(1).n_bytes == 0L)
  }

  test("decodeStub is deterministic in the payload") {
    val b = "same bytes".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b) == Multimodal.decodeStub(b))
  }

  test("decodeImage reads true PNG dimensions and channels") {
    import java.awt.image.BufferedImage._
    assert(Multimodal.decodeImage(pngBytes(20, 10, TYPE_INT_RGB))
      .contains((20L, 10L, 3L)))
    assert(Multimodal.decodeImage(pngBytes(7, 5, TYPE_BYTE_GRAY))
      .contains((7L, 5L, 1L)))
    // non-image payloads: no reader claims them
    assert(Multimodal.decodeImage("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    // corrupt header: PNG magic followed by garbage must not throw
    val corrupt = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
      0x1a, 0x0a, 1, 2, 3)
    assert(Multimodal.decodeImage(corrupt).isEmpty)
  }

  test("extractFeatures decodes real images executor-side, stubs the rest") {
    import spark.implicits._
    import java.awt.image.BufferedImage._
    val png = pngBytes(33, 17, TYPE_INT_RGB)
    val recs = Seq(
      Multimodal.MediaRecord(1L, png),
      Multimodal.MediaRecord(2L, "not an image".getBytes("UTF-8"))).toDS()
    val out = Multimodal.extractFeatures(recs).collect().sortBy(_.doc_id)
    assert((out(0).width, out(0).height, out(0).channels) == (33L, 17L, 3L))
    assert((out(1).width, out(1).height, out(1).channels)
      == Multimodal.decodeStub("not an image".getBytes("UTF-8")))
  }

  test("resizeAll: binary-to-binary executor transform, deterministic") {
    import spark.implicits._
    val recs = Seq(Multimodal.MediaRecord(1L, "payload".getBytes("UTF-8")))
      .toDS()
    val out = Multimodal.resizeAll(recs, 224, 224).collect()
    assert(out.head.doc_id == 1L)
    assert(new String(out.head.media, "UTF-8").endsWith(":224x224"))
    val again = Multimodal.resizeAll(recs, 224, 224).collect()
    assert(out.head.media.toSeq == again.head.media.toSeq)
  }

  test("sampleFrames: 1-to-N frame rows, stride respected") {
    import spark.implicits._
    val payload = Array.fill[Byte](10)(7) // 10 bytes -> 1 + 10 % 32 = 11 frames
    val recs = Seq(Multimodal.MediaRecord(5L, payload)).toDS()
    val all = Multimodal.sampleFrames(recs, everyN = 1).collect()
    assert(all.length == 11)
    assert(all.map(_.frame_idx).toSeq == (0L until 11L))
    val strided = Multimodal.sampleFrames(recs, everyN = 4).collect()
    assert(strided.map(_.frame_idx).toSeq == Seq(0L, 4L, 8L))
    // frame hashes are per-frame distinct and deterministic
    assert(all.map(_.frame_hash).distinct.length == 11)
  }

  test("mediaMeta (built-in exprs) matches extractFeatures (mapPartitions)") {
    val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val viaExprs = Multimodal.mediaMeta(media.toDF(), "doc_id", "media")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val viaJvm = Multimodal.extractFeatures(media).toDF()
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(viaExprs.toSeq == viaJvm.toSeq)
  }

  test("mediaTable exposes documents as (doc_id, binary media)") {
    val ds = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val r = ds.head()
    assert(r.media.nonEmpty)
    assert(ds.schema.fields.map(_.name).toSeq == Seq("doc_id", "media"))
  }
}
