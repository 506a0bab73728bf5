package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.SparkSpec

/** JSONL ingest: schema-enforced parse, corrupt-line quarantine, blank-line
  * tolerance, and the write round-trip (the curated-corpus export twin).
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("good lines parse, corrupt lines quarantine verbatim, blanks drop") {
    val dir = Files.createTempDirectory("jsonl_in")
    val f = dir.resolve("part-0.jsonl")
    Files.write(f, Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "hallo welt"}""",          // missing field -> null lang
      """{"doc_id": "three", "text": 7 BROKEN""",          // unparseable
      "",                                                   // blank -> dropped
      """not json at all""",                                // unparseable
      """{"doc_id": 4, "text": "ciao", "lang": "it"}"""
    ).mkString("\n").getBytes)

    val (good, bad) = Jsonl.read(spark, dir.toString, schema)
    val g = good.orderBy("doc_id").as[(Option[Long], String, Option[String])].collect().toSeq
    assert(g == Seq(
      (Some(1L), "hello world", Some("en")),
      (Some(2L), "hallo welt", None),
      (Some(4L), "ciao", Some("it"))), g.mkString("\n"))
    val b = bad.as[String].collect().toSet
    assert(b == Set("""{"doc_id": "three", "text": 7 BROKEN""", "not json at all"), b)
  }

  test("write/read round-trip preserves rows; documents table round-trips") {
    val out = Files.createTempDirectory("jsonl_out").resolve("docs").toString
    val df = Seq((1L, "a b c", "en"), (2L, "x y", "de"))
      .toDF("doc_id", "text", "lang")
    Jsonl.write(df, out)
    val (back, bad) = Jsonl.read(spark, out, schema)
    assert(bad.isEmpty)
    assert(back.orderBy("doc_id").collect().toSeq ==
      df.orderBy("doc_id").collect().toSeq)
    // real table shape: the testdata documents parquet survives the trip
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
    val out2 = Files.createTempDirectory("jsonl_out2").resolve("docs").toString
    Jsonl.write(docs, out2)
    val (back2, bad2) = Jsonl.read(spark, out2, schema)
    assert(bad2.isEmpty)
    assert(back2.count() == docs.count())
    assert(back2.exceptAll(docs).isEmpty && docs.exceptAll(back2).isEmpty)
  }

  test("streaming twin: a landing-zone file drains through the same split") {
    val in = Files.createTempDirectory("jsonl_stream_in")
    val outGood = Files.createTempDirectory("jsonl_stream_good").toString
    val ck = Files.createTempDirectory("jsonl_stream_ck").toString
    Files.write(in.resolve("drop-1.jsonl"), Seq(
      """{"doc_id": 10, "text": "streamed doc", "lang": "en"}""",
      """garbage line""",
      """{"doc_id": 11, "text": "zweites dokument", "lang": "de"}"""
    ).mkString("\n").getBytes)
    val (good, bad) = Jsonl.readStream(spark, in.toString, schema)
    assert(good.isStreaming && bad.isStreaming)
    val q = good.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet").option("path", outGood).start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(outGood)
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(got == Seq((10L, "streamed doc", "en"), (11L, "zweites dokument", "de")), got)
  }
}
