package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Multimodal plumbing (SURVEY.md §7.5 — decode STUBBED, plumbing real). */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("fromText builds binary payloads with correct byte length and sha256") {
    val df = Seq((1L, "hello"), (2L, "héllo")).toDF("doc_id", "text")
    val out = Multimodal.fromText(df, "doc_id", "text")
    val r = out.filter($"asset_id" === 1L)
      .select($"meta.n_bytes", $"meta.digest", $"payload").collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getString(1) == "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    assert(new String(r.getAs[Array[Byte]](2), "UTF-8") == "hello")
    // multi-byte char: é is 2 bytes in UTF-8
    val r2 = out.filter($"asset_id" === 2L).select($"meta.n_bytes").collect().head
    assert(r2.getLong(0) == 6L)
  }

  test("stubDecode is deterministic and emits positive dimensions") {
    val df = Seq((1L, "abc"), (2L, "abc")).toDF("doc_id", "text")
    val out = Multimodal.fromText(df, "doc_id", "text")
      .select($"decoded.width".as("w"), $"decoded.height".as("h")).collect()
    assert(out(0) == out(1))
    assert(out.forall(r => r.getInt(0) > 0 && r.getInt(1) > 0))
  }

  test("decodePartitioned: per-partition codec path decodes every asset deterministically") {
    val df = Seq((1L, "hello"), (2L, "world"), (3L, "")).toDF("doc_id", "text")
    val assets = Multimodal.fromText(df, "doc_id", "text")
    val out1 = Multimodal.decodePartitioned(assets).collect().sortBy(_.asset_id)
    val out2 = Multimodal.decodePartitioned(assets).collect().sortBy(_.asset_id)
    assert(out1.toSeq == out2.toSeq) // deterministic across runs
    assert(out1.map(_.asset_id).toSeq == Seq(1L, 2L, 3L))
    assert(out1(0).n_bytes == 5L && out1(0).width > 0 && out1(0).height > 0)
    assert(out1(2).n_bytes == 0L && out1(2).width == 0) // empty payload
  }

  test("asset schema matches the declared contract") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    val out = Multimodal.fromText(df, "doc_id", "text").drop("decoded")
    assert(out.schema.fieldNames.toSeq == Multimodal.assetSchema.fieldNames.toSeq)
  }
}
