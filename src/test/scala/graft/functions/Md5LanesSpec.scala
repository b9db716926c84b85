package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** graft_md5_lanes must be VALUE-identical, lane for lane, to the
  * hex-string idiom every DuckDB oracle uses —
  * `conv(substring(md5(s), 1 + 8g, 8), 16, 10)` — or the bootstrap
  * weights silently diverge from their SQL twin.
  */
class Md5LanesSpec extends SparkSpecBase {
  import spark.implicits._

  test("all four lanes equal the conv(substring(md5)) idiom on a varied corpus") {
    // ids shaped like the bootstrap's salted keys, plus unicode + empty
    val ids = (0 until 500).map(i => s"${i}_${i % 8}") ++
      Seq("", "héllo wörld", "é世界", "a" * 300)
    val df = ids.toDF("s")
      .withColumn("lanes", call_function("graft_md5_lanes", col("s")))
    val cols = (0 until 4).flatMap { g =>
      Seq(
        element_at(col("lanes"), g + 1).as(s"native_$g"),
        conv(substring(md5(col("s")), 1 + 8 * g, 8), 16, 10).cast("long").as(s"idiom_$g"))
    }
    df.select(cols: _*).collect().foreach { r =>
      for (g <- 0 until 4)
        assert(r.getLong(2 * g) == r.getLong(2 * g + 1),
          s"lane $g diverged: native=${r.getLong(2 * g)} idiom=${r.getLong(2 * g + 1)}")
    }
  }

  test("null propagates; lanes are uint32-ranged") {
    val out = Seq(Option("x"), None).toDF("s")
      .select(call_function("graft_md5_lanes", col("s")).as("l"))
      .collect()
    assert(out.exists(_.isNullAt(0)), "null input must yield null lanes")
    val lanes = out.filterNot(_.isNullAt(0)).head.getSeq[Long](0)
    assert(lanes.length == 4 && lanes.forall(l => l >= 0 && l <= 0xffffffffL))
  }
}
