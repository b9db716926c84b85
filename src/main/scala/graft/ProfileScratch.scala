package graft

import org.apache.spark.sql.SparkSession

// TEMPORARY local profiling harness — not part of the driver contract;
// deleted before the round ships.
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = EngineIO.configure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(e.jobId, System.nanoTime()): Unit
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach(t0 => jobNanos.addAndGet(System.nanoTime() - t0): Unit)
      }
    })
    def time[A](tag: String)(f: => A): A = {
      val j0 = jobs.get(); val n0 = jobNanos.get()
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $tag%-44s ${dt}%8.3f s  jobs=${jobs.get() - j0}%4d  jobtime=${(jobNanos.get() - n0) / 1e9}%8.3f s")
      r
    }
    args.foreach { name =>
      (1 to 3).foreach { i =>
        time(s"$name (pass $i)") {
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    // bootstrap decomposition
    if (args.contains("stats_bootstrap_ci")) {
      import org.apache.spark.sql.functions._
      val base = graft.queries.Fixtures.events(spark, dir)
        .select(col("event_type").as("grp"), col("event_id").cast("string").as("__id"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("v"))
        .filter(col("v").isNotNull)
      (1 to 2).foreach { i =>
        time(s"bootstrap: base scan only ($i)") {
          base.write.format("noop").mode("overwrite").save()
        }
      }
      val withHashes = (0 until 8).foldLeft(base)((d, g) =>
        d.withColumn(s"__h$g", call_function("graft_md5_lanes", concat(col("__id"), lit(s"_$g")))))
      (1 to 2).foreach { i =>
        time(s"bootstrap: + 8 md5 lanes ($i)") {
          withHashes.write.format("noop").mode("overwrite").save()
        }
      }
      val weighted = (0 until 32).foldLeft(withHashes) { (d, b) =>
        val u = (element_at(col(s"__h${b / 4}"), b % 4 + 1) % 1000000L).cast("double") / lit(1000000.0)
        d.withColumn(s"__w$b",
          when(u < 0.367879441, 0L).when(u < 0.735758882, 1L)
            .when(u < 0.919698603, 2L).when(u < 0.981011843, 3L).otherwise(4L))
      }
      (1 to 2).foreach { i =>
        time(s"bootstrap: + 32 weights ($i)") {
          weighted.write.format("noop").mode("overwrite").save()
        }
      }
      val decAggs = Seq(count(lit(1)).as("n"), sum(col("v").cast("decimal(38,0)")).as("__sx")) ++
        (0 until 32).flatMap(b => Seq(
          sum((col(s"__w$b") * col("v")).cast("decimal(38,0)")).as(s"__s$b"),
          sum(col(s"__w$b")).as(s"__n$b")))
      (1 to 2).foreach { i =>
        time(s"bootstrap: decimal aggs ($i)") {
          weighted.groupBy(col("grp")).agg(decAggs.head, decAggs.tail: _*)
            .write.format("noop").mode("overwrite").save()
        }
      }
      val longAggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("__sx")) ++
        (0 until 32).flatMap(b => Seq(
          sum(col(s"__w$b") * col("v")).as(s"__s$b"),
          sum(col(s"__w$b")).as(s"__n$b")))
      (1 to 2).foreach { i =>
        time(s"bootstrap: long aggs ($i)") {
          weighted.groupBy(col("grp")).agg(longAggs.head, longAggs.tail: _*)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
