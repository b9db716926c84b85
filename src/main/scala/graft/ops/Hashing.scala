package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine-neutral hash gate shared by every bucketing/sampling operator
  * (distributed numbered buckets, stratified sampling): the first 8 hex
  * chars of md5 read as a non-negative long. One definition so the Spark
  * side and the SQL twins (`CAST(concat('0x', substr(md5(x),1,8)) AS
  * BIGINT)`) cannot drift per call site.
  */
object Hashing {

  /** First 8 hex chars of md5(c) as a long in [0, 2^32).
    *
    * MEASURED: do NOT route this through the native lane extractor
    * ([[graft.functions.Md5Lanes]]) — a single-lane gate pays the full
    * 4-lane digest, an UnsafeArrayData allocation, and (inside HOF
    * lambdas) the interpreted eval path, and the sketch/gate family
    * regressed 11.4 → 13.9 s at sf0.1 when md5Long was swapped wholesale
    * (round 15). The native form wins only where MANY lanes amortize one
    * digest — the Poisson-bootstrap weight synthesis uses it directly.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** md5Long mod m — the uniform gate in [0, m). */
  def md5Mod(c: Column, m: Long): Column = pmod(md5Long(c), lit(m))
}
