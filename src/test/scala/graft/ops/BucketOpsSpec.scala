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

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
