package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture loaders for the driver star schema (TESTDATA.md). */
object Fixtures {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for — read it as long nanos (legacy conf) and truncate to
    * microsecond TimestampType (exactly what DuckDB's epoch_us does to
    * TIMESTAMP_NS, so oracles agree).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events").withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
