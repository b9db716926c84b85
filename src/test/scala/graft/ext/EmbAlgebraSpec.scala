package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The embedding linear-algebra toolkit on hand-computable inputs: the
  * integer-grid covariance pyramid, the deterministic power iteration
  * (exact on an eigenvector start, dominant-direction + Rayleigh bounds on
  * a generic one), and the map-only projection serve. The registered
  * queries (emb_covariance / emb_pca_project / emb_jl_distortion) are
  * DuckDB-oracle-checked by the driver; this spec pins the driver-side
  * model math those queries bake into their plans.
  */
class EmbAlgebraSpec extends SparkSpecBase {
  import spark.implicits._

  // vectors (1,2), (3,6), (5,4): quantized (1000,2000),(3000,6000),(5000,4000)
  // n=3; cov_ppm(0,0) = round((3*35e6 - 81e6)/9)  = 2_666_667
  //      cov_ppm(0,1) = round((3*40e6 - 108e6)/9) = 1_333_333
  //      cov_ppm(1,1) = round((3*56e6 - 144e6)/9) = 2_666_667
  private def fixture =
    Seq(Seq(1.0f, 2.0f), Seq(3.0f, 6.0f), Seq(5.0f, 4.0f)).toDF("v")

  test("covariance emits exact integer co-moment sums and the half-up ppm estimate") {
    val got = EmbAlgebra
      .covariance(fixture, col("v"), dim = 2)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got((0, 0)) == ((3L, 9000L, 9000L, 35000000L, 2666667L)))
    assert(got((0, 1)) == ((3L, 9000L, 12000L, 40000000L, 1333333L)))
    assert(got((1, 1)) == ((3L, 12000L, 12000L, 56000000L, 2666667L)))
    assert(got.size == 3, s"upper triangle of dim 2 is 3 pairs: ${got.keySet}")
  }

  test("covariance bounded-buffer aggregate is bit-identical to the HOF contract") {
    // the dot/dotHof discipline: the fast kernel's executable definition
    // is the HOF form — every field of every pair row must match on a
    // fixture with negatives, ties, and a larger dim than the toy
    val emb = graft.queries.Fixtures.t(spark, "/root/testdata/sf0.001", "embeddings")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val fast = rows(EmbAlgebra.covariance(emb, col("embedding"), dim = 64))
    val hof = rows(EmbAlgebra.covarianceHof(emb, col("embedding"), dim = 64))
    assert(fast.size == 64 * 65 / 2 && fast == hof)
  }

  test("covPpmMatrix mirrors the upper triangle into a symmetric dense model") {
    val m = EmbAlgebra.covPpmMatrix(fixture, col("v"), dim = 2)
    assert(m(0)(0) == 2666667L && m(1)(1) == 2666667L)
    assert(m(0)(1) == 1333333L && m(1)(0) == 1333333L)
  }

  test("topComponent is exact on an eigenvector start: fixpoint, zero delta, exact Rayleigh") {
    // the fixture covariance has dominant eigenvector (1,1) — exactly v0 —
    // with eigenvalue 2666667+1333333 = 4_000_000; every round must
    // renormalize back to the same grid vector
    val m = Array(Array(2666667L, 1333333L), Array(1333333L, 2666667L))
    val (v, prev, lambda) = EmbAlgebra.topComponent(m, rounds = 4)
    assert(v.toSeq == Seq(1000000L, 1000000L) && prev.toSeq == v.toSeq)
    assert(lambda == 4000000L, s"Rayleigh quotient must be the exact eigenvalue, got $lambda")
  }

  test("topComponent converges to the dominant axis with the documented grid arithmetic") {
    // diag(3e6, 1e6): each round divides the off-axis coordinate by 3 on
    // the 1e6 grid (333333 -> 111111 -> 37037 -> 12346)
    val m = Array(Array(3000000L, 0L), Array(0L, 1000000L))
    val (v, prev, lambda) = EmbAlgebra.topComponent(m, rounds = 4)
    assert(v.toSeq == Seq(1000000L, 12346L), s"round-4 grid vector: ${v.toSeq}")
    assert(prev.toSeq == Seq(1000000L, 37037L), s"round-3 grid vector: ${prev.toSeq}")
    assert(lambda > 2990000L && lambda <= 3000000L,
      s"Rayleigh must approach the dominant eigenvalue from below: $lambda")
  }

  test("topComponents: deflation recovers the exact second eigenpair on a 2x2") {
    // [[2666667,1333333],[1333333,2666667]]: eigenpairs (1,1)/4e6 and
    // (1,−1)/1333334. The rank-1 deflation is EXACT here (λ·v_i·v_j/vᵀv
    // = 2e6 for every entry), leaving [[666667,−666667],[−666667,666667]];
    // the index-perturbed start (1e6, 1e6+1) has a nonzero (1,−1)
    // component, and one matvec lands exactly on the grid eigenvector.
    val m = Array(Array(2666667L, 1333333L), Array(1333333L, 2666667L))
    val comps = EmbAlgebra.topComponents(m, m = 2, rounds = 4)
    assert(comps(0)._1.toSeq == Seq(1000000L, 1000000L) && comps(0)._2 == 4000000L,
      s"first component: ${comps(0)._1.toSeq} λ=${comps(0)._2}")
    assert(comps(1)._1.toSeq == Seq(-1000000L, 1000000L) && comps(1)._2 == 1333334L,
      s"second component: ${comps(1)._1.toSeq} λ=${comps(1)._2}")
  }

  test("topComponents: descending lambdas and axis recovery on a diagonal matrix") {
    val m = Array(
      Array(3000000L, 0L, 0L),
      Array(0L, 2000000L, 0L),
      Array(0L, 0L, 1000000L))
    val comps = EmbAlgebra.topComponents(m, m = 3, rounds = 8)
    val axes = comps.map(_._1.zipWithIndex.maxBy(p => math.abs(p._1))._2)
    assert(axes == Seq(0, 1, 2), s"components must recover the axes in order: $axes")
    val lams = comps.map(_._2)
    assert(lams.zip(lams.tail).forall { case (a, b) => a >= b },
      s"lambdas must be non-increasing: $lams")
    assert(lams(0) > 2900000L && lams(1) > 1900000L && lams(2) > 900000L,
      s"each lambda must approach its eigenvalue: $lams")
  }

  test("pcaReducedVec: half-up milli-grid reduction of the exact scores, FLOAT-exact") {
    val comps = Seq(Array(2L, 3L), Array(-1L, 1L))
    // quantized rows (1000,2000),(3000,6000),(5000,4000); scores c1:
    // 8000,24000,22000 → floor(s/1e6+0.5) = 0,0,0... use bigger comps to
    // exercise the rounding: scale by 1e5 → scores 8e8,24e8,22e8 →
    // 800,2400,2200; c2 scores 1000,3000,-1000 → ·1e5 → 100,300,-100
    val big = comps.map(_.map(_ * 100000L))
    val got = fixture
      .select(EmbAlgebra.pcaReducedVec(Similarity.quantize(col("v")), big).as("r"))
      .collect()
      .map(_.getSeq[Float](0).toSeq)
      .sortBy(_.head)
      .toSeq
    assert(got == Seq(Seq(800.0f, 100.0f), Seq(2200.0f, -100.0f), Seq(2400.0f, 300.0f)), got)
  }

  test("projectScore serves the exact integer dot with the component as plan literals") {
    val got = fixture
      .select(EmbAlgebra.projectScore(col("v"), Array(2L, 3L)).as("s"))
      .as[Long].collect().sorted
    // (1000,2000)*(2,3)=8000; (3000,6000)->24000; (5000,4000)->22000
    assert(got.toSeq == Seq(8000L, 22000L, 24000L))
  }

  test("jlDistortion histogram covers every gated pair exactly once") {
    val emb = graft.queries.Fixtures.t(spark, "/root/testdata/sf0.001", "embeddings")
    val gated = emb
      .filter(graft.ops.Hashing.md5Mod(col("vec_id").cast("string"), 2L) === 0)
      .count()
    val hist = EmbAlgebra
      .jlDistortion(emb, col("vec_id"), col("embedding"), dim = 64, planes = 6, gateMod = 2)
      .agg(sum(col("n_pairs"))).collect()(0).getLong(0)
    assert(hist == gated * (gated - 1) / 2,
      s"bucket counts must partition the ${gated}-choose-2 pair set, got $hist")
  }

  test("coMomentFlat sums are additive and covPpmFromSums equals the relational fit exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    val merged = EmbAlgebra.mergeCoMoments(
      EmbAlgebra.coMomentFlat(base, col("embedding"), dim = 64),
      EmbAlgebra.coMomentFlat(batch, col("embedding"), dim = 64))
    // additivity: merge of the parts IS the union's pyramid, bit-for-bit
    val union = EmbAlgebra.coMomentFlat(emb, col("embedding"), dim = 64)
    assert(merged.sameElements(union), "merged co-moment sums must equal the union fit")
    // derivation parity: the driver-side rule equals the relational one
    val fromSums = EmbAlgebra.covPpmFromSums(merged, dim = 64)
    val relational = EmbAlgebra.covPpmMatrix(emb, col("embedding"), dim = 64)
    assert(
      fromSums.indices.forall(i => fromSums(i).sameElements(relational(i))),
      "covPpmFromSums must reproduce covPpmMatrix exactly — refresh ≡ retrain")
  }

  test("refresh responds to drift: refreshed components cut the drifted batch's residual") {
    // base era varies along axis 0 only; the appended era drifts onto
    // axis 1 — the shape ann_index_staleness flags. A STALE model (fit on
    // base alone) cannot represent the new axis; the refreshed model
    // (merged sums, no retrain over the union) must reduce the drifted
    // batch's PCA residual — the staleness-drop the refresh loop exists
    // to deliver.
    val dim = 4
    def vec(axis: Int, mag: Int, id: Int) =
      (0 until dim).map(d => if (d == axis) mag.toFloat else (id % 3).toFloat - 1f)
    val base = (0 until 40).map(i => (i.toLong, vec(0, 50 + (i % 7) * 10, i)))
    val drifted = (40 until 80).map(i => (i.toLong, vec(1, 60 + (i % 5) * 10, i)))
    val baseDf = base.toDF("vec_id", "embedding")
    val driftDf = drifted.toDF("vec_id", "embedding")
    val sumsBase = EmbAlgebra.coMomentFlat(baseDf, col("embedding"), dim)
    val sumsDrift = EmbAlgebra.coMomentFlat(driftDf, col("embedding"), dim)
    val stale = EmbAlgebra.topComponents(EmbAlgebra.covPpmFromSums(sumsBase, dim), m = 1, rounds = 6)
    val fresh = EmbAlgebra.topComponents(
      EmbAlgebra.covPpmFromSums(EmbAlgebra.mergeCoMoments(sumsBase, sumsDrift), dim), m = 2, rounds = 6)
    // residual of the drifted batch after removing the model's subspace:
    // ||q||² − Σ_k (q·v_k / |v_k|)² in plain double math (a test gauge,
    // not an engine contract)
    def residual(comps: Seq[Array[Long]]): Double = drifted.map { case (_, v) =>
      val q = v.map(x => math.floor(x * 1000 + 0.5))
      val qq = q.map(x => x * x).sum
      qq - comps.map { c =>
        val dot = q.zip(c).map { case (a, b) => a * b.toDouble }.sum
        dot * dot / c.map(x => x.toDouble * x).sum
      }.sum
    }.sum
    val rStale = residual(stale.map(_._1))
    val rFresh = residual(fresh.map(_._1))
    info(f"drifted-batch residual stale=$rStale%.3e refreshed=$rFresh%.3e")
    assert(rFresh < rStale * 0.5,
      s"refreshed components must absorb the drift axis: $rFresh !< ${rStale * 0.5}")
  }
}
