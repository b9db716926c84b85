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

  test("asset schema matches the declared contract") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    val out = Multimodal.fromText(df, "doc_id", "text").drop("decoded")
    assert(out.schema.fieldNames.toSeq == Multimodal.assetSchema.fieldNames.toSeq)
  }
}
