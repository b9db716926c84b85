package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured ingestion: parse a JSON-lines payload column against a
  * declared schema and ROUTE instead of fail — well-formed rows surface
  * their typed fields, malformed rows carry a disposition flag so the
  * caller can quarantine them as a queryable set (the
  * [[ValidateOps.partition]] flagship discipline applied to the ingest
  * boundary, where real scraped corpora break first).
  *
  * Semantics: a row is `ingest_ok` iff every `required` field parsed
  * non-null. `from_json` is PERMISSIVE — a truncated tail can yield a
  * PARTIAL struct (leading fields populated, the cut one null) — so
  * requiring the full field set is what makes the flag equivalent to
  * json-validity for payloads whose required fields are always written:
  * any corruption either breaks the parse entirely (null struct) or cuts
  * at least one required field.
  *
  * Scale shape: one codegen'd map-only pass (JacksonParser inside
  * whole-stage codegen), no shuffle, no driver state; the quarantine is a
  * filter on the flag, so the good path and the quarantine path share the
  * one scan. At 100 TB this is the shape that matters — corrupt-record
  * handling must never turn the ingest scan into a job-failing or
  * driver-collecting path.
  */
object IngestOps {

  /** Adds `parsed` (the typed struct) and `ingest_ok` to `df`. */
  def parseWithQuarantine(
      df: DataFrame,
      payloadCol: Column,
      schema: StructType,
      required: Seq[String]): DataFrame = {
    require(required.nonEmpty, "at least one required field defines validity")
    require(
      required.forall(schema.fieldNames.contains),
      s"required fields ${required.filterNot(schema.fieldNames.contains)} missing from schema")
    val parsed = from_json(payloadCol, schema)
    val ok = required
      .map(f => parsed.getField(f).isNotNull)
      .reduce(_ && _)
    df.withColumn("parsed", parsed).withColumn("ingest_ok", ok)
  }
}
