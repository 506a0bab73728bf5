package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

/** SFT chat render: loss spans must address exactly the assistant text
  * inside the rendered string (verified by reconstructing the render and
  * substring-ing the spans), fingerprint matches the reconstruction, null
  * text tolerated, ties broken by turn id.
  */
class SftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("loss spans address exactly the assistant text; fp matches the reconstruction") {
    val events = Seq(
      (1L, ts(0), 10L, "user", "hi there"),
      (1L, ts(1), 11L, "assistant", "hello!"),
      (1L, ts(2), 12L, "user", "bye"),
      (1L, ts(3), 13L, "assistant", "see you"),
      (2L, ts(0), 20L, "assistant", null: String), // null text -> empty span
      (2L, ts(1), 21L, "user", "x")
    ).toDF("conv", "t", "id", "role", "text")
    val out = Sft.renderChat(events, "conv", "t", "id", "role", "text")
      .orderBy("conv", "turn_idx").collect()
    // reconstruct each conversation's render the way the operator defines it
    val turnsByConv = Map(
      1L -> Seq(("user", "hi there"), ("assistant", "hello!"),
        ("user", "bye"), ("assistant", "see you")),
      2L -> Seq(("assistant", ""), ("user", "x")))
    val renders = turnsByConv.view.mapValues(_.map {
      case (r, tx) => s"<|$r|>$tx<|end|>"
    }.mkString).toMap
    for (row <- out) {
      val conv = row.getLong(0); val idx = row.getInt(1); val role = row.getString(2)
      val render = renders(conv)
      assert(row.getLong(5) == turnsByConv(conv).size)   // n_turns
      assert(row.getLong(6) == render.length)            // n_chars
      assert(row.getString(7) ==                         // render_fp
        org.apache.commons.codec.digest.DigestUtils.md5Hex(render))
      if (role == "assistant") {
        val (ls, le) = (row.getLong(3), row.getLong(4))
        assert(render.substring(ls.toInt, le.toInt) == turnsByConv(conv)(idx - 1)._2)
      } else {
        assert(row.isNullAt(3) && row.isNullAt(4))
      }
    }
  }

  test("turn order: same timestamp breaks ties by turn id") {
    val events = Seq(
      (1L, ts(0), 2L, "assistant", "second"),
      (1L, ts(0), 1L, "user", "first")
    ).toDF("conv", "t", "id", "role", "text")
    val out = Sft.renderChat(events, "conv", "t", "id", "role", "text")
      .orderBy("turn_idx").collect()
    assert(out(0).getString(2) == "user" && out(1).getString(2) == "assistant")
    // span of "second" starts after the whole first piece + its own header
    val firstPiece = "<|user|>first<|end|>"
    assert(out(1).getLong(3) == firstPiece.length + "<|assistant|>".length)
  }

  test("token spans: hand-computed offsets with atomic delimiter tokens") {
    // "hi there" -> BPE pieces "hi"," there" = 2; "hello!" -> "hello","!" = 2
    val events = Seq(
      (1L, ts(0), 10L, "user", "hi there"),
      (1L, ts(1), 11L, "assistant", "hello!")
    ).toDF("conv", "t", "id", "role", "text")
    val out = Sft.tokenSpans(events, "conv", "t", "id", "role", "text")
      .orderBy("turn_idx").collect()
    // user piece = 1 + 2 + 1 = 4 tokens; assistant text spans [5, 7)
    assert(out(0).getAs[Long]("n_text_tokens") == 2 &&
      out(0).isNullAt(out(0).fieldIndex("tok_start")))
    assert(out(1).getAs[Long]("tok_start") == 5L)
    assert(out(1).getAs[Long]("tok_end") == 7L)
    assert(out.forall(_.getAs[Long]("n_tokens") == 8L))
  }

  test("token spans: null text yields an EMPTY assistant span, not a null one") {
    val events = Seq(
      (1L, ts(0), 1L, "assistant", null: String),
      (1L, ts(1), 2L, "user", "x")
    ).toDF("conv", "t", "id", "role", "text")
    val out = Sft.tokenSpans(events, "conv", "t", "id", "role", "text")
      .orderBy("turn_idx").collect()
    assert(out(0).getAs[Long]("tok_start") == 1L)
    assert(out(0).getAs[Long]("tok_end") == 1L) // zero-width: nothing to mask
    assert(out.forall(_.getAs[Long]("n_tokens") == 5L)) // 2 + (2+1)
  }

  test("FIM: hand-computed cuts, render, and loss span") {
    // id=2, n=10: c1 = (2*7919) % 8 + 1 = 7; c2 = 8 + (2*104729) % 2 = 8
    val out = Sft.fimTransform(
      Seq((2L, "abcdefghij")).toDF("doc_id", "text"), "doc_id", "text").collect()
    val r = out.head
    assert(r.getAs[String]("mode") == "psm")
    assert(r.getAs[String]("rendered") == "<|pre|>abcdefg<|suf|>ij<|mid|>h")
    assert(r.getAs[Long]("loss_start") == 30L && r.getAs[Long]("loss_end") == 31L)
    // token space: "abcdefg"/"ij"/"h" are 1 BPE piece each + 3 sentinels
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("tok_loss_start") == 5L)
    assert(r.getAs[Long]("tok_loss_end") == 6L)
  }

  test("FIM: the loss span addresses exactly the moved middle; pieces reconstruct") {
    val docs = (0L until 40L).map(i =>
      (i, ("the quick brown fox jumps over the lazy dog " * (i.toInt % 3 + 1)).trim))
    val out = Sft.fimTransform(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = docs.toMap
    for (r <- out) {
      val (id, text) = (r.getAs[Long]("doc_id"), byId(r.getAs[Long]("doc_id")))
      val rendered = r.getAs[String]("rendered")
      val (ls, le) = (r.getAs[Long]("loss_start").toInt, r.getAs[Long]("loss_end").toInt)
      val (tls, tle) = (r.getAs[Long]("tok_loss_start"), r.getAs[Long]("tok_loss_end"))
      if (r.getAs[String]("mode") == "psm") {
        assert(id % 2 == 0)
        // strip the three 7-char headers, reassemble prefix+middle+suffix
        val body = rendered.drop(7)
        val Array(prefix, rest) = body.split("<\\|suf\\|>", 2)
        val Array(suffix, middle) = rest.split("<\\|mid\\|>", 2)
        assert(prefix + middle + suffix == text, s"doc $id does not reconstruct")
        assert(middle.nonEmpty && prefix.nonEmpty && suffix.nonEmpty)
        assert(rendered.substring(ls, le) == middle)
        // token layout: middle is last, so its span ends at n_tokens; at
        // least the 3 sentinels + one prefix/suffix piece precede it
        assert(tle == r.getAs[Long]("n_tokens") && tls >= 5 && tls < tle)
      } else {
        assert(id % 2 == 1)
        assert(rendered == text && ls == 0 && le == text.length)
        assert(tls == 0 && tle == r.getAs[Long]("n_tokens"))
      }
    }
  }

  test("FIM: short and null docs stay raw instead of tripping the modulus") {
    val out = Sft.fimTransform(
      Seq((0L, "ab"), (2L, null: String), (4L, "xyz")).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("mode") == "raw") // n=2 < 3, even id
    assert(out(1).getAs[String]("mode") == "raw" &&
      out(1).getAs[Long]("loss_end") == 0L)       // null text
    assert(out(2).getAs[String]("mode") == "psm") // n=3 is the boundary
  }

  test("token spans partition the conversation: pieces tile [0, n_tokens)") {
    val events = Seq(
      (1L, ts(0), 1L, "user", "a b c"),
      (1L, ts(1), 2L, "assistant", "d e"),
      (1L, ts(2), 3L, "user", "f"),
      (1L, ts(3), 4L, "assistant", "g h i j")
    ).toDF("conv", "t", "id", "role", "text")
    val out = Sft.tokenSpans(events, "conv", "t", "id", "role", "text")
      .orderBy("turn_idx").collect()
    val total = out.head.getAs[Long]("n_tokens")
    assert(total == out.map(_.getAs[Long]("n_text_tokens") + 2).sum)
    // every assistant span sits strictly inside its piece's extent
    var cursor = 0L
    for (row <- out) {
      val pieceEnd = cursor + row.getAs[Long]("n_text_tokens") + 2
      if (row.getString(2) == "assistant") {
        assert(row.getAs[Long]("tok_start") == cursor + 1)
        assert(row.getAs[Long]("tok_end") == pieceEnd - 1)
      }
      cursor = pieceEnd
    }
    assert(cursor == total)
  }
}
