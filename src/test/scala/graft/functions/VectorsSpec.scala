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
}
