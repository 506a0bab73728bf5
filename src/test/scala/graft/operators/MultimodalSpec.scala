package graft.operators

import graft.SparkSpec

/** M-series multimodal plumbing: binary payloads, typed metadata, decode
  * stub, frame sampling shape.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "abc"), (2L, ""), (3L, "hello world!")).toDF("doc_id", "text")

  test("asMedia: payload bytes + metadata struct") {
    val m = Multimodal.asMedia(docs, "doc_id", "text").orderBy("media_id").collect()
    assert(m(0).getAs[Array[Byte]]("payload").toSeq == "abc".getBytes("UTF-8").toSeq)
    val meta = m(0).getStruct(2)
    assert(meta.getString(0) == "text/plain" && meta.getLong(3) == 3L)
  }

  test("decodeFeatures: head hex + byte mean via mapPartitions") {
    val f = Multimodal.decodeFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
      .orderBy("media_id").select("features.*").collect()
    assert(f(0).getString(1) == "616263") // 'abc'
    assert(math.abs(f(0).getDouble(2) - (97 + 98 + 99) / 3.0) < 1e-9)
    assert(f(1).getLong(0) == 0L && f(1).getString(1) == "" && f(1).getDouble(2) == 0.0)
  }

  test("sampleFrames: fixed windows, at least one frame per payload") {
    val frames = Multimodal.sampleFrames(
      Multimodal.asMedia(docs, "doc_id", "text"), frameBytes = 4, stride = 1)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(3L) == 3L) // 12 bytes / 4 = 3 windows
    val first = frames.filter($"media_id" === 3L && $"frame_idx" === 0)
      .select("frame").as[Array[Byte]].head()
    assert(new String(first, "UTF-8") == "hell")
  }

  test("resizeStub: aspect-preserving dims, strided payload, passthrough without dims") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.asMedia(docs, "doc_id", "text")
      .withColumn("meta", when($"media_id" === 3L,
        struct(lit("image/x-fake").as("media_type"), lit(640).as("width"),
          lit(480).as("height"), $"meta.n_bytes".as("n_bytes")))
        .otherwise($"meta"))
    val out = Multimodal.resizeStub(media, maxDim = 320).orderBy("media_id").collect()
    val img = out.find(_.getLong(0) == 3L).get
    assert(img.getAs[Boolean]("resized"))
    assert(img.getAs[Int]("out_width") == 320 && img.getAs[Int]("out_height") == 240)
    assert(img.getAs[Int]("stride") == 2)
    // "hello world!" strided by 2 -> "hlowrd"
    assert(new String(img.getAs[Array[Byte]]("payload"), "UTF-8") == "hlowrd")
    val txt = out.find(_.getLong(0) == 1L).get // text media: no dims
    assert(!txt.getAs[Boolean]("resized"))
    assert(new String(txt.getAs[Array[Byte]]("payload"), "UTF-8") == "abc")
  }

  test("chunkPayload: overlapping windows, truncated tail, empty payloads skipped") {
    // media 3: "hello world!" (12 bytes), chunk 6 / hop 4 -> offsets 0,4,8
    val chunks = Multimodal.chunkPayload(
      Multimodal.asMedia(docs, "doc_id", "text"), chunkBytes = 6, hopBytes = 4)
      .orderBy("media_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        new String(r.getAs[Array[Byte]]("chunk"), "UTF-8"), r.getLong(3)))
    val m3 = chunks.filter(_._1 == 3L).toSeq
    assert(m3 == Seq((3L, 0L, "hello ", 6L), (3L, 1L, "o worl", 6L), (3L, 2L, "rld!", 4L)))
    assert(!chunks.exists(_._1 == 2L)) // doc 2 is the empty payload
  }
}
