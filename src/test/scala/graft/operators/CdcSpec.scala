package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CDC apply: last-writer-wins per key, tombstones delete, unseen keys pass. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latest change wins; delete tombstones; insert, update, passthrough all covered") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val log = Seq(
      // key 1: upsert then LATER delete -> gone
      (1L, "upsert", "a2", ts("2024-01-01 10:00:00"), 1L),
      (1L, "delete", "x", ts("2024-01-01 11:00:00"), 2L),
      // key 2: delete then LATER upsert -> resurrected with new value
      (2L, "delete", "x", ts("2024-01-01 10:00:00"), 3L),
      (2L, "upsert", "b2", ts("2024-01-01 11:00:00"), 4L),
      // key 9: upsert of an unseen key -> insert
      (9L, "upsert", "fresh", ts("2024-01-01 10:00:00"), 5L)
    ).toDF("k", "op", "v", "ts", "seq")
    val out = Cdc.applyLog(base, log, "k", Seq("v"), "op", "ts", "seq")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "b2"), (3L, "c"), (9L, "fresh")), out)
  }

  test("equal timestamps break by the tie column (log sequence)") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val t0 = ts("2024-01-01 10:00:00")
    val log = Seq(
      (1L, "upsert", "first", t0, 1L),
      (1L, "upsert", "second", t0, 2L)).toDF("k", "op", "v", "ts", "seq")
    val out = Cdc.applyLog(base, log, "k", Seq("v"), "op", "ts", "seq")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "second")), out)
  }
}
