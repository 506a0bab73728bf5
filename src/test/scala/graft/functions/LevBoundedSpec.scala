package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** lev_bounded: result-identical to the builtin bounded levenshtein on every
  * input — random ASCII, unicode (fallback path), adversarial edge shapes —
  * on both eval paths.
  */
class LevBoundedSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def randStr(alpha: String, maxLen: Int): String =
    Seq.fill(rnd.nextInt(maxLen + 1))(alpha(rnd.nextInt(alpha.length))).mkString

  // mutate a string with ~e edits so distances cluster near thresholds
  private def mutate(s: String, e: Int): String = {
    var out = s.toVector
    (1 to e).foreach { _ =>
      if (out.isEmpty) out = Vector('x')
      else rnd.nextInt(3) match {
        case 0 => out = out.updated(rnd.nextInt(out.size), 'z')
        case 1 => out = out.patch(rnd.nextInt(out.size), Nil, 1)
        case 2 => out = out.patch(rnd.nextInt(out.size), Seq('q'), 0)
      }
    }
    out.mkString
  }

  private val cases: Seq[(String, String, Int)] = {
    val ascii = "abcdef 0123"
    val uni = "aé中😀b" // multibyte incl. surrogate pair
    Seq.tabulate(300) { i =>
      val alpha = if (i % 5 == 4) uni else ascii
      val a = randStr(alpha, 40)
      val b = if (i % 2 == 0) mutate(a, rnd.nextInt(12)) else randStr(alpha, 40)
      (a, b, rnd.nextInt(15))
    } ++ Seq(("", "", 0), ("", "abc", 2), ("", "abc", 3), ("abc", "abc", 0),
      ("中文", "中石", 1), ("aaaa", "aaaa", 0))
  }

  test("matches builtin levenshtein(a,b,k) on random + unicode + edges (both eval paths)") {
    val df = cases.toDF("a", "b", "k")
    def check(): Unit = {
      // per-row thresholds: group rows by k so the literal arg stays foldable
      cases.map(_._3).distinct.foreach { k =>
        val bad = df.filter($"k" === k)
          .select($"a", $"b",
            Text.levBounded($"a", $"b", k).as("ours"),
            levenshtein($"a", $"b", k).as("builtin"))
          .filter(not($"ours" <=> $"builtin"))
          .collect()
        assert(bad.isEmpty, s"k=$k diverged: ${bad.take(5).mkString(", ")}")
      }
    }
    check()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check()
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("nulls propagate; direct DP agrees with builtin on driver-side sweep") {
    val out = Seq((Some("ab"), None: Option[String])).toDF("a", "b")
      .select(Text.levBounded($"a", $"b", 3)).head()
    assert(out.isNullAt(0))
    // exhaustive tiny-string sweep (driver-side, no Spark): all pairs over
    // {a,b}^<=4 at k in 0..4
    val alpha = Seq("", "a", "b", "ab", "ba", "aab", "abab", "bbaa")
    for (x <- alpha; y <- alpha; k <- 0 to 4) {
      val ours = LevDp.dist(UTF8String.fromString(x), UTF8String.fromString(y), k)
      val ref = UTF8String.fromString(x).levenshteinDistance(UTF8String.fromString(y), k)
      assert(ours == ref, s"('$x','$y',k=$k): $ours != $ref")
    }
  }
}
