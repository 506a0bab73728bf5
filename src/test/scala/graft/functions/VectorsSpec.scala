package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** lshBucketFast: bit-identical buckets to the adaptive HOF lshBucket for
  * matching dims; NULL bucket on a length mismatch (dot_f32 guard).
  */
class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("lshBucketFast equals lshBucket on random 64-dim vectors") {
    val rnd = new scala.util.Random(17)
    val vecs = Seq.tabulate(300) { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "v")
    val diff = vecs.select(
      Vectors.lshBucket($"v", 6).as("slow"),
      Vectors.lshBucketFast($"v", 6, 64).as("fast"))
      .filter(not($"slow" <=> $"fast"))
    assert(diff.isEmpty)
  }

  test("lshBucketFast with wrong dims yields null bucket") {
    val vecs = Seq((1L, Array(1f, 2f, 3f))).toDF("id", "v")
    assert(vecs.select(Vectors.lshBucketFast($"v", 4, 64)).head().isNullAt(0))
  }

  test("a NULL embedding element yields a NULL bucket, never bucket-0 collision") {
    // round-11 advice: the fold over a null element is NULL, and mapping it
    // to bit 0 would silently collide such rows into one bucket (and could
    // disagree with the witness oracle's NULL-skipping SUM) — both paths
    // must propagate null so the row drops out of the band equi-join
    val withNull = Seq((1L, Array[java.lang.Float](1f, null, 3f, 4f)))
      .toDF("id", "v")
    assert(withNull.select(Vectors.lshBucketFixedPoint($"v", 4, 4)).head().isNullAt(0))
    assert(withNull.select(Vectors.lshBucketFast($"v", 4, 4)).head().isNullAt(0))
    // a well-formed sibling row still buckets non-null
    val ok = Seq((2L, Array(1f, 2f, 3f, 4f))).toDF("id", "v")
    assert(!ok.select(Vectors.lshBucketFixedPoint($"v", 4, 4)).head().isNullAt(0))
  }
}
