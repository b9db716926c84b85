package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineIO.configure(SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      // timed through the noop sink like Bench — count() would let Catalyst
      // prune the very projections a map-only query exists to measure
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"BENCHONE $name rows=$n t=$t%.2f s")
    }
    spark.stop()
  }
}
