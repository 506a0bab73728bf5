package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** T-series scalar surface: tokenizer, shingles, stopwords, quality inputs. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("t").select(Text.tokens(col("t")).as("x")).as[Seq[String]].head()

  test("tokens: lowercase alnum, empties dropped") {
    assert(toks("Hello, World! 123") == Seq("hello", "world", "123"))
    assert(toks("--- ,,, ") == Seq())
    assert(toks("a") == Seq("a"))
  }

  test("shingles3: 3-grams in order; fewer than 3 tokens → empty") {
    val sh = Seq("a b c d").toDF("t")
      .select(Text.tokens(col("t")).as("toks"))
      .select(Text.shingles3(col("toks")).as("s")).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Text.tokens(col("t")).as("toks"))
      .select(Text.shingles3(col("toks")).as("s")).as[Seq[String]].head()
    assert(short == Seq())
  }

  test("bigrams: 2-grams in order; fewer than 2 tokens → empty") {
    val bg = Seq("a b c").toDF("t")
      .select(Text.tokens(col("t")).as("toks"))
      .select(Text.bigrams(col("toks")).as("b")).as[Seq[String]].head()
    assert(bg == Seq("a b", "b c"))
    val one = Seq("a").toDF("t")
      .select(Text.tokens(col("t")).as("toks"))
      .select(Text.bigrams(col("toks")).as("b")).as[Seq[String]].head()
    assert(one == Seq())
  }

  test("stopwordHits counts membership") {
    val n = Seq("the cat and the hat").toDF("t")
      .select(Text.stopwordHits(Text.tokens(col("t"))).as("n")).as[Int].head()
    assert(n == 3) // the, and, the
  }

  test("punctCount: non-alnum non-space after lowering") {
    val n = Seq("Hi, there! (ok)").toDF("t")
      .select(Text.punctCount(col("t")).as("n")).as[Int].head()
    assert(n == 4) // , ! ( )
  }

  test("fingerprint: whitespace-normalized, case-insensitive, md5-shaped") {
    val fps = Seq("A  B\tC", "a b c", "a b d").toDF("t")
      .select(Text.fingerprint(col("t")).as("f")).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
    assert(fps(0).matches("[0-9a-f]{32}"))
  }

  test("totalTokenLen sums token lengths") {
    val n = Seq("ab cde f").toDF("t")
      .select(Text.totalTokenLen(Text.tokens(col("t"))).as("n")).as[Int].head()
    assert(n == 6)
  }
}
