package graft

import graft.operators.Multimodal

import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  private def media = Seq(
    (1L, "hello world this is a fake jpeg payload"),
    (2L, "another payload with different bytes entirely"),
    (3L, "x")
  ).toDF("id", "txt").select($"id", $"txt".cast("binary").as("media"))

  test("decodeImages: real PNG round-trip recovers size, color, channels") {
    // encode → decode through the distributed pipeline; PNG is lossless so
    // the solid color comes back exactly
    val imgs = Seq(
      (1L, Multimodal.encodePng(20, 10, 0xFF0000)), // red
      (2L, Multimodal.encodePng(7, 33, 0x00FF00)),  // green
      (3L, Multimodal.encodePng(1, 1, 0x4080C0))
    ).toDF("id", "media")
    val rows = Multimodal.decodeImages(
      Multimodal.asMedia(imgs, "id", "media")).collect().sortBy(_.id)
    assert(rows.length == 3)
    assert(rows(0).width == 20 && rows(0).height == 10)
    assert(rows(1).width == 7 && rows(1).height == 33)
    rows.foreach(r => assert(r.nChannels == 3 && r.features.length == 8))
    assert(math.abs(rows(0).features(0) - 1.0f) < 1e-6) // meanR of red = 1
    assert(math.abs(rows(0).features(1)) < 1e-6)
    assert(math.abs(rows(1).features(1) - 1.0f) < 1e-6) // meanG of green = 1
    assert(math.abs(rows(2).features(0) - 0x40 / 255.0f) < 1e-6)
    assert(math.abs(rows(2).features(2) - 0xC0 / 255.0f) < 1e-6)
    assert(rows.forall(_.nBytes > 0))
  }

  test("undecodable payloads are dropped, not fatal") {
    val rows = Multimodal.decodeImages(
      Multimodal.asMedia(media, "id", "media")).collect()
    assert(rows.isEmpty) // text bytes are not an image
  }

  test("resizeImage: real bilinear resize re-encodes to the target size") {
    val src = Multimodal.encodePng(40, 20, 0x336699)
    val out = Multimodal.resizeImage(src, 10, 5)
    assert(out.isDefined)
    val dec = Multimodal.decodeImage(9L, out.get).get
    assert(dec.width == 10 && dec.height == 5)
    // solid color survives interpolation exactly
    assert(math.abs(dec.features(0) - 0x33 / 255.0f) < 1e-6)
    assert(Multimodal.resizeImage("junk".getBytes, 4, 4).isEmpty)
  }

  test("frameSample slices the payload and keeps every Nth frame") {
    val df = media.select($"id",
      Multimodal.frameSample($"media", frameBytes = 10, everyN = 2).as("frames"),
      Multimodal.frameCount($"media", 10).as("n"))
    val r = df.where($"id" === 1).head()
    val frames = r.getSeq[Array[Byte]](1)
    val n = r.getInt(2)
    assert(n == 4) // ceil(39 bytes / 10)
    assert(frames.length == 2) // frames 0 and 2
    assert(new String(frames.head) == "hello worl")
    assert(new String(frames(1)) == "a fake jpe") // frame index 2
  }

  test("frameSample: NULL media yields NULL, not a phantom one-frame array") {
    val df = Seq((1L, Option.empty[Array[Byte]]), (2L, Some(Array[Byte](1, 2, 3))))
      .toDF("id", "media")
      .select($"id", Multimodal.frameSample($"media", 2, 1).as("frames"))
    val byId = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(byId(1L)) // NULL in, NULL out (matches frameCount)
    assert(!byId(2L))
    intercept[IllegalArgumentException] {
      Multimodal.frameSample($"media", 2, 0) // everyN=0 would drop all
    }
    intercept[IllegalArgumentException] {
      Multimodal.frameCount($"media", 0)
    }
  }

  test("asMedia rejects a non-integral id column upfront") {
    val df = Seq(("doc-1", Array[Byte](1))).toDF("doc_id", "media")
    val ex = intercept[IllegalArgumentException] {
      Multimodal.asMedia(df, "doc_id", "media")
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("resizedByteEstimate scales by area ratio") {
    val df = media.where($"id" === 1).select(
      Multimodal.resizedByteEstimate($"media", lit(100), lit(100), 50, 50)
        .as("b"))
    assert(df.head().getLong(0) == 9L) // floor(39 bytes * 2500/10000)
  }
}
