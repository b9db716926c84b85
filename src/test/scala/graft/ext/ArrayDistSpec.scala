package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Exactness contract of the native ANN kernels: [[graft.functions.ArrayL2SqAll]]
  * (`graft_l2sq`) and [[graft.functions.ArrayAdcSum]] (`graft_adc`) must be
  * bit-identical to the built-in HOF folds they replaced
  * ([[Similarity.distancesToHof]] / [[Similarity.adcSumHof]]) — every ANN
  * oracle hash (cell assignment, k-means training, PQ codes, ADC ranking)
  * depends on them.
  */
class ArrayDistSpec extends SparkSpecBase {
  import spark.implicits._

  private def quantized = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", Similarity.quantize($"embedding").as("q"))

  test("graft_l2sq matches the HOF distance row over fixture vectors x sampled centroids") {
    val cents: Seq[Seq[Long]] = quantized
      .orderBy($"vec_id")
      .limit(8)
      .collect()
      .map(_.getSeq[Long](1).toSeq)
      .toSeq
    val cmat = typedLit(cents)
    val diff = quantized
      .select(
        Similarity.distancesTo(cmat, $"q").as("native"),
        Similarity.distancesToHof(cmat, $"q").as("hof"))
      .filter(to_json($"native") =!= to_json($"hof"))
      .count()
    assert(diff == 0, s"$diff distance rows diverge from the HOF fold")
  }

  test("graft_l2sq nulls exactly the entries the HOF fold nulls") {
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), 0),    // clean vs both centroids
      (Seq[java.lang.Long](1L, null), 1),  // null element -> every entry null
      (Seq[java.lang.Long](1L, 2L, 3L), 2) // length mismatch -> every entry null
    ).toDF("q", "tag")
    val cmat = typedLit(Seq(Seq(0L, 0L), Seq(3L, 4L)))
    val rows = df
      .select(
        $"tag",
        Similarity.distancesTo(cmat, $"q").as("native"),
        Similarity.distancesToHof(cmat, $"q").as("hof"))
      .orderBy($"tag")
      .collect()
    rows.foreach { r =>
      assert(
        r.getSeq[Any](1) == r.getSeq[Any](2),
        s"tag ${r.getInt(0)}: native ${r.getSeq[Any](1)} vs hof ${r.getSeq[Any](2)}")
    }
    assert(rows(0).getSeq[Long](1) == Seq(5L, 8L))
    assert(rows(1).getSeq[Any](1) == Seq(null, null))
    assert(rows(2).getSeq[Any](1) == Seq(null, null))
  }

  test("graft_adc matches the HOF table-lookup sum, and nulls where it nulls") {
    val df = Seq(
      (Seq(Seq(10L, 20L), Seq(30L, 40L)), Seq[Integer](1, 0), 0),   // 20 + 30
      (Seq(Seq(10L, 20L), Seq(30L, 40L)), Seq[Integer](0, null), 1), // null code
      (Seq(Seq(10L, 20L)), Seq[Integer](0, 1), 2)                    // length mismatch
    ).toDF("tbl", "codes", "tag")
    val rows = df
      .select(
        $"tag",
        Similarity.adcSum($"tbl", $"codes").as("native"),
        Similarity.adcSumHof($"tbl", $"codes").as("hof"))
      .orderBy($"tag")
      .collect()
    assert(rows(0).getLong(1) == 50L && rows(0).getLong(2) == 50L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2), "null code must be NULL on both")
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2), "length mismatch must be NULL on both")
  }

  test("graft_adc parity across fixture PQ codes and a real query table") {
    // a real (books, codes, tbl) composition: train tiny codebooks on the
    // fixture, code the corpus, build one query's ADC table, and compare
    // the native sum against the HOF fold over every (query, candidate)
    val raw = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .orderBy($"vec_id")
      .limit(64)
      .cache()
    val e = raw.select($"vec_id", Similarity.quantize($"embedding").as("q"))
    val dim = e.select(size($"q")).first().getInt(0)
    val nsub = 4
    val books = Similarity.pqTrain(raw, "vec_id", "embedding", nsub, 4, 2)
    val pm = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val dsub = dim / nsub
    val coded = e
      .withColumn(
        "codes",
        transform(
          sequence(lit(0), lit(nsub - 1)),
          j => {
            val d = Similarity.distancesTo(
              element_at(pm, j + 1),
              slice($"q", j * dsub + 1, lit(dsub)))
            element_at(
              array_sort(
                zip_with(d, sequence(lit(0), lit(books(0).length - 1)), (dd, ii) =>
                  struct(dd.as("d"), ii.as("i")))),
              1
            ).getField("i").cast("int")
          }
        ))
    val q = e
      .limit(4)
      .select(
        $"vec_id".as("query_id"),
        transform(
          sequence(lit(0), lit(nsub - 1)),
          j =>
            Similarity.distancesTo(
              element_at(pm, j + 1),
              slice($"q", j * dsub + 1, lit(dsub)))).as("tbl"))
    val diff = coded
      .crossJoin(broadcast(q))
      .select(
        Similarity.adcSum($"tbl", $"codes").as("native"),
        Similarity.adcSumHof($"tbl", $"codes").as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diff == 0, s"$diff ADC sums diverge from the HOF fold")
  }

  test("srpBucketQ with the native dot matches the HOF projection fold") {
    val dim = quantized.select(size($"q")).first().getInt(0)
    val planes = 8
    val coeffs = Similarity.srpCoefficients(dim, planes)
    val hofBucket = (0 until planes)
      .map { p =>
        val proj = aggregate(
          zip_with($"q", typedLit(coeffs(p)), (x, c) => x * c),
          lit(0L),
          (acc, v) => acc + v)
        when(proj >= 0, lit(1)).otherwise(lit(0)) * lit(1 << p)
      }
      .reduce(_ + _)
    val diff = quantized
      .select(
        Similarity.srpBucketQ($"q", dim, planes).as("native"),
        hofBucket.as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diff == 0, s"$diff SRP buckets diverge from the HOF fold")
  }
}
