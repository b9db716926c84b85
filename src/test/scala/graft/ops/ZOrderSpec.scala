package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  test("zValue interleaves bits exactly (x even positions, y odd)") {
    // x=5 (101), y=3 (011): bits -> 1<<0 (x0) + 1<<1 (y0) + 1<<3 (y1) + 1<<4 (x2) = 27
    val out = Seq((5L, 3L))
      .toDF("x", "y")
      .select(ZOrderOps.zValue($"x", $"y", 3).as("z"))
      .first()
      .getLong(0)
    assert(out == 27L)
    // reference implementation over a value sweep
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val sweep = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = sweep
      .toDF("x", "y")
      .select($"x", $"y", ZOrderOps.zValue($"x", $"y", 4).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1), 4))
    }
  }

  test("z-order layout bounds the per-partition spread of BOTH dimensions") {
    // comparable wide domains in both dims so the curve actually
    // interleaves (wildly asymmetric domains degrade to the wider dim's
    // linear sort — sized by the caller per the zValue scaladoc):
    // orderkey spans 0..1499 and partkey 0..199 at sf0.001
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(
        (col("l_orderkey") % 256).as("x"),
        (col("l_partkey") % 128).as("y"))

    def spreads(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val per = df
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(
          (max("x") - min("x")).as("sx"),
          (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy"))
        .first()
      (per.getDouble(0), per.getDouble(1))
    }

    val zed = ZOrderOps.zorderLayout(li, "x", "y", bits = 8, partitions = 16)
    val (zx, zy) = spreads(zed)
    val xsorted = li.repartitionByRange(16, col("x")).sortWithinPartitions("x")
    val (lx, ly) = spreads(xsorted)

    info(f"z-order spreads x=$zx%.0f y=$zy%.0f; x-sort spreads x=$lx%.0f y=$ly%.0f")
    // a 16-partition z-range covers ~a 64x64 block of the 256x128 grid:
    // both dims stay well below the full range...
    assert(zx < 192, f"z-order x spread $zx%.0f not bounded")
    assert(zy < 96, f"z-order y spread $zy%.0f not bounded")
    // ...while the linear sort is tight in x only — y stays ~unconstrained
    assert(ly > 100, f"x-sort y spread $ly%.0f unexpectedly tight — fixture changed?")
    assert(zy < ly * 3 / 4, f"z-order y spread $zy%.0f should beat the x-sort's $ly%.0f")
  }
}
