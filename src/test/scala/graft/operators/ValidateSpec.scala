package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** P4-P10, P16 (SURVEY.md §2.2): predicates over RAW strings, regex is
  * shape-only, split partitions the input exactly.
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def emailValid(v: String): Boolean =
    Seq(Option(v)).toDF("email")
      .select(Validate.validEmail(col("email")).as("v"))
      .head().getBoolean(0)

  test("P4 email: accepts plain addresses") {
    assert(emailValid("user@example.com"))
    assert(emailValid("a.b+c_d%e@sub.domain.co"))
  }

  test("P4 email: rejects null, blank, whitespace, shape errors") {
    assert(!emailValid(null))
    assert(!emailValid(""))
    assert(!emailValid("   "))
    assert(!emailValid("no-at-sign.com"))
    assert(!emailValid("user@"))
    assert(!emailValid("user@domain"))          // no TLD
    assert(!emailValid("user@@x.com"))
  }

  private def dateValid(v: String): Boolean =
    Seq(Option(v)).toDF("d")
      .select(Validate.validDate(col("d")).as("v"))
      .head().getBoolean(0)

  test("P5 date: null is VALID (dates optional), blank is INVALID") {
    assert(dateValid(null))
    assert(!dateValid(""))
    assert(!dateValid("   "))
  }

  test("P5 date: shape-only regex — 29/02 and 31/04 PASS (reference parity)") {
    assert(dateValid("29/02/2023 10:00")) // not a real date; shape-valid
    assert(dateValid("31/04/2024 23:59"))
    assert(dateValid("01/12/2024 00:00"))
  }

  test("P5 date: shape violations fail") {
    assert(!dateValid("32/01/2024 10:00")) // day 32
    assert(!dateValid("00/01/2024 10:00")) // day 00
    assert(!dateValid("15/13/2024 10:00")) // month 13
    assert(!dateValid("15/01/2024 24:00")) // hour 24
    assert(!dateValid("15/01/2024 10:60")) // minute 60
    assert(!dateValid("2024-01-15 10:00")) // ISO shape
    assert(!dateValid("15/01/24 10:00"))   // 2-digit year
  }

  test("P16 layout: missing columns fail, extra columns warn-only") {
    val full = Layout.validColumns.map(c => c -> "x")
    val okDf = Seq(1).toDF("i").select(full.map { case (c, v) => lit(v).as(c) }: _*)
    assert(Validate.checkLayout(okDf).ok)

    val extra = okDf.withColumn("bonus", lit(1))
    val chkExtra = Validate.checkLayout(extra)
    assert(chkExtra.ok && chkExtra.extra == Seq("bonus"))

    val missing = okDf.drop("email", "Opens")
    val chkMissing = Validate.checkLayout(missing)
    assert(!chkMissing.ok && chkMissing.missing.toSet == Set("email", "Opens"))
  }

  test("P7/P8 split: partition invariant ok ∪ err = input, ok ∩ err = ∅") {
    val raw = Seq(
      ("good@x.com", "01/01/2024 10:00"),
      ("bad", "01/01/2024 10:00"),
      ("also@ok.io", null),
      ("fine@y.org", "99/01/2024 10:00")
    ).toDF("email", "Fecha envio")
    val flagged = Validate.withValidityFlags(raw, dateCols = Seq("Fecha envio"))
    val (ok, err) = Validate.split(flagged)
    assert(ok.count() + err.count() == raw.count())
    assert(ok.intersect(err).isEmpty)
    assert(ok.select("email").as[String].collect().toSet == Set("good@x.com", "also@ok.io"))
  }
}
