package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import graft.ops.PinOps
import graft.ext.{Dedup, Similarity}
import graft.sources.Xlsx

/** Property-based invariants for the pure helper layers (scalacheck).
  * Spark-free where possible — Column-algebra properties are covered by the
  * oracle gate; these pin the driver-side Scala helpers and codecs.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def holds(p: Prop, samples: Int = 200): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(samples), p)
    assert(r.passed, r.status.toString)
  }

  test("xlsx colRef/colIndex are inverse over a wide index range") {
    holds(forAll(Gen.chooseNum(0, 20000)) { i =>
      Xlsx.colIndex(Xlsx.colRef(i) + "1") == i
    })
  }

  test("xlsx roundtrip preserves arbitrary printable cell content") {
    // strings of printable unicode (no raw control chars — the writer drops
    // those by XML 1.0 rule, pinned in XlsxSpec)
    val cell = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('&', '<', '>', '"', '\'', ' ', 'é', '雪', '∑', '|')
    )).map(_.mkString)
    val rowsGen = Gen.listOfN(5, Gen.listOfN(3, cell))
    holds(forAll(rowsGen) { rows =>
      val header = Seq("a", "b", "c")
      val bytes = Xlsx.buildWorkbook(Seq("S" -> (header +: rows.map(_.toSeq))))
      val (_, gotHeader, gotRows) = Xlsx.parseWorkbook(bytes).head
      // empty cells write as blank and read back null — normalize both sides
      def norm(s: Seq[Seq[String]]) =
        s.map(_.map(v => if (v == null || v.isEmpty) null else v))
      gotHeader == header && norm(gotRows) == norm(rows.map(_.toSeq))
    })
  }

  test("srpCoefficients are within [-500, 500) and stable") {
    val c1 = Similarity.srpCoefficients(64, 6)
    val c2 = Similarity.srpCoefficients(64, 6)
    assert(c1 == c2)
    assert(c1.flatten.forall(v => v >= -500 && v < 500))
    // planes differ from each other (not a degenerate constant table)
    assert(c1.distinct.size == 6)
  }

  test("normalizePin maps every digit-string shape to the documented lengths") {
    val digits = Gen.chooseNum(1, 16).flatMap(n => Gen.listOfN(n, Gen.numChar).map(_.mkString))
    holds(forAll(digits) { d =>
      val out = spark.range(1).select(PinOps.normalizePin(lit(d))).head.getString(0)
      val expected = d.length match {
        case 13 => "0" + d
        case 10 => d + "0000"
        case 9  => "0" + d + "0000"
        case _  => d
      }
      out == expected
    }, samples = 60)
  }

  test("jaccard stays in [0,1] and equals 1 iff equal non-empty sets") {
    val arr = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")).map(_.distinct)
    holds(forAll(arr, arr) { (x, y) =>
      val j = Seq((x, y)).toDF("x", "y")
        .select(Dedup.jaccard($"x", $"y")).head.getDouble(0)
      val inBounds = j >= 0.0 && j <= 1.0
      val oneIff = (j == 1.0) == (x.toSet == y.toSet && x.nonEmpty)
      inBounds && oneIff
    }, samples = 60)
  }
}
