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
