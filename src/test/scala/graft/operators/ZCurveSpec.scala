package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Morton interleave arithmetic + the layout property that justifies it:
  * chunks of a z-sorted table are tight in BOTH dimensions.
  */
class ZCurveSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: known value and exhaustive roundtrip at 6 bits") {
    // a=5 (101) -> z bits 0,4; b=3 (011) -> z bits 1,3: z = 1+2+8+16 = 27
    val known = Seq((5L, 3L)).toDF("a", "b")
      .select(ZCurve.interleave(col("a"), col("b"), 3)).as[Long].head()
    assert(known == 27L, known)

    val grid = (for { a <- 0 until 64; b <- 0 until 64 } yield (a.toLong, b.toLong))
      .toDF("a", "b")
      .withColumn("z", ZCurve.interleave(col("a"), col("b"), 6))
    // bijective on the grid + exact inverses
    assert(grid.select("z").distinct().count() == 64L * 64L)
    val bad = grid.filter(
      ZCurve.deinterleave(col("z"), 0, 6) =!= col("a") ||
        ZCurve.deinterleave(col("z"), 1, 6) =!= col("b"))
    assert(bad.isEmpty)
  }

  test("interleaveN: 2-D case equals interleave; 3-D is bijective on the grid") {
    val two = Seq((5L, 3L)).toDF("a", "b")
      .select(ZCurve.interleaveN(Seq(col("a"), col("b")), 3) ===
        ZCurve.interleave(col("a"), col("b"), 3)).as[Boolean].head()
    assert(two)
    val grid3 = (for { a <- 0 until 8; b <- 0 until 8; c <- 0 until 8 }
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
      .withColumn("z", ZCurve.interleaveN(Seq(col("a"), col("b"), col("c")), 3))
    assert(grid3.select("z").distinct().count() == 512)
    assert(grid3.agg(max(col("z"))).as[Long].head() == 511) // keys dense in [0, 2^9)
  }

  test("z-sorted chunks are tight on BOTH dimensions; single-key sort is not") {
    val pts = for { a <- 0 until 64; b <- 0 until 64 } yield (a.toLong, b.toLong)
    def chunkSpread(sorted: Seq[(Long, Long)]): (Long, Long) = {
      val spreads = sorted.grouped(256).map { c =>
        (c.map(_._1).max - c.map(_._1).min, c.map(_._2).max - c.map(_._2).min)
      }.toSeq
      (spreads.map(_._1).max, spreads.map(_._2).max)
    }
    val zOf = pts.toDF("a", "b")
      .withColumn("z", ZCurve.interleave(col("a"), col("b"), 6))
      .select("a", "b", "z").as[(Long, Long, Long)].collect()
      .sortBy(_._3).map(t => (t._1, t._2)).toSeq
    val (za, zb) = chunkSpread(zOf)
    // 4096 points / 16 chunks: z-order chunks are aligned 16x16 quadrants
    assert(za <= 15 && zb <= 15, s"z spreads: $za, $zb")
    // sorting by `a` alone: b stays full-range in every chunk -> a filter
    // on b prunes nothing (the scenario z-order exists to fix)
    val (sa, sb) = chunkSpread(pts.sortBy(identity))
    assert(sa <= 3 && sb == 63, s"single-key spreads: $sa, $sb")
  }

  test("layout preserves content and emits the requested file parallelism") {
    val df = (for { a <- 0 until 32; b <- 0 until 32 } yield (a.toLong, b.toLong, a * 32L + b))
      .toDF("a", "b", "payload")
    val laid = ZCurve.layout(df, col("a"), col("b"), bits = 5, numFiles = 8)
    assert(laid.rdd.getNumPartitions == 8)
    assert(laid.except(df).isEmpty && df.except(laid).isEmpty)
  }
}
