package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: correctness + the exchange-free plan. */
class BucketOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketedEquiJoin matches the plain join and plans with NO exchange") {
    val left = (0 until 500).map(i => (i.toLong % 50, s"l$i")).toDF("k", "lv")
    val right = (0 until 200).map(i => (i.toLong % 40, s"r$i")).toDF("k", "rv")
    // force the sort-merge path: broadcast would hide the bucketing story
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = BucketOps.bucketedEquiJoin(spark, left, right, "k", buckets = 8, tag = "spec")
      val got = joined.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      val want = left.join(right, "k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      assert(got.toSeq == want.toSeq)
      // the point of the layout: bucket i joins bucket i, no shuffle stage
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    }
  }

  test("layout once, joinBucketed repeatedly: zero Exchange and zero re-write per query") {
    val left = (0 until 300).map(i => (i.toLong % 30, s"l$i")).toDF("k", "lv")
    val right = (0 until 120).map(i => (i.toLong % 25, s"r$i")).toDF("k", "rv")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      BucketOps.layout(left, "graft_bkt_amort_l", buckets = 8, key = "k")
      BucketOps.layout(right, "graft_bkt_amort_r", buckets = 8, key = "k")
      def tableFiles(t: String): Map[String, Long] = {
        val loc = new java.io.File(new java.net.URI(
          spark.sessionState.catalog
            .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
            .location.toString))
        loc.listFiles().map(f => f.getAbsolutePath -> f.lastModified()).toMap
      }
      val first = BucketOps.joinBucketed(spark, "graft_bkt_amort_l", "graft_bkt_amort_r", "k")
      val want = left.join(right, "k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      assert(first.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toSeq == want.toSeq)
      val before = (tableFiles("graft_bkt_amort_l"), tableFiles("graft_bkt_amort_r"))
      // the amortized call: same layout, second join
      val second = BucketOps.joinBucketed(spark, "graft_bkt_amort_l", "graft_bkt_amort_r", "k")
      assert(second.collect().length == want.length)
      val plan = second.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"amortized join still shuffles:\n$plan")
      // zero write: the layout files (paths AND mtimes) are untouched
      val after = (tableFiles("graft_bkt_amort_l"), tableFiles("graft_bkt_amort_r"))
      assert(after == before, "joinBucketed rewrote the bucketed layout")
    }
  }

}
