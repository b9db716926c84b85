package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = graft.queries.Fixtures.events(spark, dir)
    def time(tag: String)(f: => Unit): Unit =
      (1 to 3).foreach { p => val t0 = System.nanoTime(); f; println(f"$tag pass$p ${(System.nanoTime()-t0)/1e9}%.2f s") }
    val reps = 32
    val base = ev.select(col("event_type").as("grp"), col("event_id").cast("string").as("__id"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("v")).filter(col("v").isNotNull)
    val cdf = Seq(0.367879, 0.735759, 0.919699, 0.981012)
    val withH = (0 until 8).foldLeft(base)((d, g) => d.withColumn(s"__h$g", md5(concat(col("__id"), lit(s"_$g")))))
    val weighted = (0 until reps).foldLeft(withH) { (d, b) =>
      val u = (conv(substring(col(s"__h${b / 4}"), 1 + 8 * (b % 4), 8), 16, 10)
        .cast("long") % 1000000L).cast("double") / lit(1000000.0)
      d.withColumn(s"__w$b",
        when(u < cdf(0), 0L).when(u < cdf(1), 1L).when(u < cdf(2), 2L).when(u < cdf(3), 3L).otherwise(4L))
    }
    time("weights")(weighted.select(count(col("__w31"))).collect())
    time("weights_all")(weighted.select((0 until reps).map(b => sum(col(s"__w$b"))): _*).collect())
    val dec = "decimal(38,0)"
    val aggsDec = Seq(count(lit(1)).as("n"), sum(col("v").cast(dec)).as("__sx")) ++
      (0 until reps).flatMap(b => Seq(sum((col(s"__w$b") * col("v")).cast(dec)).as(s"__s$b"), sum(col(s"__w$b")).as(s"__n$b")))
    time("agg_decimal")(weighted.groupBy(col("grp")).agg(aggsDec.head, aggsDec.tail: _*).collect())
    val aggsLong = Seq(count(lit(1)).as("n"), sum(col("v")).as("__sx")) ++
      (0 until reps).flatMap(b => Seq(sum(col(s"__w$b") * col("v")).as(s"__s$b"), sum(col(s"__w$b")).as(s"__n$b")))
    time("agg_long")(weighted.groupBy(col("grp")).agg(aggsLong.head, aggsLong.tail: _*).collect())
    spark.stop()
  }
}
