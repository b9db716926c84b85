package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension, SURVEY.md §7.5).
  *
  * Images/audio/video are opaque `binary` columns plus a typed metadata
  * struct. The Spark-side plumbing — schema, batched per-partition
  * processing, partitioning discipline — is real; the actual media decode is
  * STUBBED behind [[stubDecode]] with a deterministic fake (the container
  * ships no image/audio codecs), clearly marked below.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(
    Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField(
        "meta",
        StructType(
          Seq(
            StructField("n_bytes", LongType, nullable = true),
            StructField("digest", StringType, nullable = true),
            StructField("width", IntegerType, nullable = true),
            StructField("height", IntegerType, nullable = true)
          )
        ),
        nullable = true
      )
    )
  )

  /** Wrap any string column as a binary payload (UTF-8) — used to exercise
    * the binary plumbing against the text fixtures.
    */
  def asPayload(c: Column): Column = encode(c, "UTF-8")

  /** Content metadata over a binary payload: byte length + sha256 digest.
    * Pure Catalyst expressions — the cheap, always-real part of the stack.
    */
  def payloadMeta(payload: Column): Column =
    struct(
      length(payload).cast("long").as("n_bytes"),
      sha2(payload, 256).as("digest")
    )

  /** ======================== STUB ========================
    * Deterministic FAKE media decode: derives pseudo width/height from the
    * payload digest instead of decoding pixels. A real deployment replaces
    * this body with a codec call inside `mapPartitions` (batch-amortized,
    * one codec context per partition); the signature, schema, and plan shape
    * stay identical.
    */
  def stubDecode(payload: Column): Column = {
    val h = sha2(payload, 256)
    val w = ((conv(substring(h, 1, 1), 16, 10).cast("long") + 1) * 64).cast("int")
    val ht = ((conv(substring(h, 2, 1), 16, 10).cast("long") + 1) * 64).cast("int")
    struct(w.as("width"), ht.as("height"))
  }

  /** Assemble an asset table from a text corpus: real binary payloads,
    * real metadata, stubbed decode. Repartitions by a hash of the id so
    * downstream per-asset work balances across executors regardless of
    * source file layout (large media rows skew file-based splits).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = asPayload(col(textCol))
    df.select(
      col(idCol).as("asset_id"),
      lit("text/plain").as("media_type"),
      payload.as("payload"),
      payloadMeta(payload).as("meta"),
      stubDecode(payload).as("decoded")
    )
  }
}
