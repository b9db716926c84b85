package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture loaders for the driver star schema (TESTDATA.md).
  *
  * Posture mirrors the reference's coerce-on-read robustness
  * (reference: chicago/permit_cleaning.py:639-641 `errors="coerce"`,
  * :1158-1164 forced dtypes on CSV re-read): the loader inspects what
  * physically arrived rather than assuming one parquet annotation, and
  * fails with a *named* schema diff instead of letting a refreshed
  * fixture surface as dozens of scattered analysis errors downstream.
  */
object Fixtures {

  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private val tsLike: Set[DataType]   = Set(LongType, TimestampType, TimestampNTZType)

  /** Accepted physical types per column for the tables whose encoding has
    * shifted between fixture refreshes (or plausibly could). Tables not
    * listed pass through unchecked; columns beyond the listed ones are
    * allowed (the writer may add metadata columns).
    */
  private[graft] val accepted: Map[String, Map[String, Set[DataType]]] = Map(
    "events" -> Map(
      "event_id"   -> integral,
      "ts"         -> tsLike,
      "user_id"    -> integral,
      "event_type" -> Set(StringType),
      "value"      -> Set(DoubleType),
      "props"      -> Set(StringType)),
    "documents" -> Map(
      "doc_id"  -> integral,
      "text"    -> Set(StringType),
      "lang"    -> Set(StringType),
      "source"  -> Set(StringType),
      "n_chars" -> integral),
    "embeddings" -> Map(
      "vec_id"    -> integral,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false),
                         ArrayType(DoubleType), ArrayType(DoubleType, containsNull = false)),
      "label"     -> integral)
  )

  /** Assert `df` satisfies the accepted-type sets for `name`; throws an
    * IllegalStateException naming every offending column at once.
    */
  private[graft] def assertSchema(df: DataFrame, name: String): DataFrame = {
    accepted.get(name).foreach { cols =>
      val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val diffs = cols.flatMap { case (col, ok) =>
        fields.get(col) match {
          case None => Some(s"$name.$col: MISSING (expected one of ${ok.map(_.simpleString).mkString("/")})")
          case Some(dt) if !ok.contains(dt) =>
            Some(s"$name.$col: got ${dt.simpleString}, expected one of ${ok.map(_.simpleString).mkString("/")}")
          case _ => None
        }
      }
      if (diffs.nonEmpty)
        throw new IllegalStateException(
          s"fixture schema mismatch for '$name':\n  " + diffs.mkString("\n  "))
    }
    df
  }

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    assertSchema(s.read.parquet(s"$dir/$name.parquet"), name)

  /** `events.ts` arrives in whatever encoding the fixture writer last chose:
    * parquet TIMESTAMP(NANOS) (no native Spark type — read as long nanos via
    * the legacy conf), TIMESTAMP_NTZ micros (current writers), or plain
    * session-TZ TIMESTAMP. Normalize all three to micro-precision
    * session-TZ TimestampType so `unix_micros`/`window`/`date_format`
    * semantics match the DuckDB oracle (which reads the same parquet as a
    * naive timestamp; Verify pins the session TZ to UTC).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>          // TIMESTAMP(NANOS) read as long nanos
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>  // naive micros: reinterpret in session TZ (UTC)
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>     // already instant-typed micros
        raw
      case other =>
        throw new IllegalStateException(
          s"fixture schema mismatch for 'events': ts has unsupported type ${other.simpleString}")
    }
  }
}
