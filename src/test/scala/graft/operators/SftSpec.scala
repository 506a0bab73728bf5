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
}
