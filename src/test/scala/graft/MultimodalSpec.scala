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

  test("decodeImages: deterministic stub, one row per payload, bounded meta") {
    val decoded = Multimodal.decodeImages(
      Multimodal.asMedia(media, "id", "media"))
    val rows = decoded.collect().sortBy(_.id)
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.width >= 64 && r.width < 64 + 1857)
      assert(r.height >= 64 && r.height < 64 + 1017)
      assert(r.nChannels == 3)
      assert(r.features.length == 8)
      r.features.foreach(f => assert(f >= -1.0f && f <= 1.0f))
    }
    assert(rows(2).nBytes == 1L)
    // deterministic: second run identical
    val again = Multimodal.decodeImages(
      Multimodal.asMedia(media, "id", "media")).collect().sortBy(_.id)
    assert(rows.zip(again).forall { case (a, b) =>
      a.width == b.width && a.height == b.height &&
        a.features.sameElements(b.features)
    })
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

  test("resizedByteEstimate scales by area ratio") {
    val df = media.where($"id" === 1).select(
      Multimodal.resizedByteEstimate($"media", lit(100), lit(100), 50, 50)
        .as("b"))
    assert(df.head().getLong(0) == 9L) // floor(39 bytes * 2500/10000)
  }
}
