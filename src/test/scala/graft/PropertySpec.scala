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

  test("mangleDupes always yields distinct names and keeps first occurrences bare") {
    // headers drawn from a tiny alphabet INCLUDING literal _N forms, the
    // collision-prone shape of the r5 fix
    val name = Gen.oneOf("amount", "amount_2", "amount_3", "v", "v_2", "k")
    holds(forAll(Gen.listOf(name)) { header =>
      val m = Xlsx.mangleDupes(header)
      val distinctOk = m.distinct == m
      // the first occurrence of each name keeps its bare form UNLESS an
      // earlier synthesized suffix already took it ([amount, amount,
      // amount_2]: the literal amount_2 must move aside — that collision
      // is the r5 fix)
      val firstBare = header.zipWithIndex
        .filter { case (h, i) => header.indexOf(h) == i }
        .forall { case (h, i) => m.take(i).contains(h) || m(i) == h }
      distinctOk && firstBare && m.length == header.length
    })
  }

  test("specFlagged (driver-side) agrees with fillIsFlagged (Column) on arbitrary specs") {
    val hex = Gen.listOfN(8, Gen.oneOf("0123456789ABCDEFabcdef".toSeq)).map(_.mkString)
    val spec = Gen.oneOf(
      Gen.const(null: String),
      Gen.const("FFFFFF00"), Gen.const("ffffc000"), Gen.const("#FFFF00"),
      Gen.const("theme:7:0.3999755851924192"), Gen.const("theme:7:0.2"),
      Gen.const("theme:4:0.3999755851924192"),
      // malformed segment counts — the r6 parity fix: both twins must
      // reject extra/missing colon segments identically
      Gen.const("theme:7:0.3999755851924192:x"), Gen.const("theme:7:0.2:0.3"),
      Gen.const("theme:7"), Gen.const("theme:7:"), Gen.const("theme::0.3999755851924192"),
      hex, hex.map(_.drop(2)), hex.map("theme:7:0." + _.filter(_.isDigit))
    )
    holds(forAll(Gen.listOfN(20, spec)) { specs =>
      val viaColumn = specs.toDF("s")
        .select(Xlsx.fillIsFlagged(col("s")).as("f"))
        .collect().map(_.getBoolean(0)).toSeq
      val viaScala = specs.map(Xlsx.specFlagged)
      viaColumn == viaScala
    }, samples = 30)
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

  test("packSequences partitions the corpus: every doc exactly once, budget respected") {
    import graft.ext.Curation
    // token counts across several magnitudes, including docs bigger than
    // the whole budget (they must still land in exactly one pack)
    val tokens = Gen.listOfN(40, Gen.chooseNum(1, 700))
    holds(forAll(tokens) { ts =>
      val df = ts.zipWithIndex.map { case (n, i) => (i.toLong, n.toLong) }.toDF("doc_id", "nt")
      val out = Curation.packSequences(df, $"doc_id", $"nt", budget = 512, salts = 4)
        .select("doc_id", "n_tokens", "pack_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val allDocsOnce = out.map(_._1).sorted.toSeq == (0L until ts.length.toLong).toSeq
      // cumulative-fill bound: a pack's tokens EXCLUDING its straddling
      // last doc fit the budget (the straddler may overflow by contract)
      val packsOk = out.groupBy(_._3).values.forall { members =>
        val sorted = members.sortBy(_._1).map(_._2)
        sorted.dropRight(1).sum < 512
      }
      allDocsOnce && packsOk
    }, samples = 20)
  }

  test("scrubbedDF is idempotent: a scrubbed text has nothing left to scrub") {
    import graft.ext.TextStats
    val word = Gen.oneOf("alpha", "b3ta", "x@y.io", "a.b@corp.example.org", "312-555-0142",
      "tel:312-555-0142,", "not-a-phone-123-45-6789", "@@", "user+tag@dom.co")
    val text = Gen.listOf(word).map(_.mkString(" "))
    holds(forAll(Gen.listOfN(6, text)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = TextStats.scrubbedDF(df, $"doc_id", $"text")
      val twice = TextStats.scrubbedDF(once, $"doc_id", $"scrubbed")
      twice.collect().forall { r =>
        r.getAs[Long]("n_emails") == 0L && r.getAs[Long]("n_phones") == 0L
      }
    }, samples = 15)
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

  test("interSorted (driver-side kernel) equals set intersection size on sorted distinct arrays") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def ad(xs: Seq[String]): ArrayData =
      ArrayData.toArrayData(xs.map(s => if (s == null) null else UTF8String.fromString(s)).toArray)
    // arbitrary distinct sets over a unicode-ish alphabet, sorted in the
    // same binary UTF8 order sort_array uses (UTF8String comparator)
    val tok = Gen.oneOf("a", "aa", "b", "é", "ß", "中", "z1", "z10", "Z")
    val arr = Gen.listOf(tok).map(_.distinct.map(UTF8String.fromString)
      .sorted(Ordering.comparatorToOrdering(
        java.util.Comparator.naturalOrder[UTF8String]())).map(_.toString))
    holds(forAll(arr, arr) { (x, y) =>
      graft.functions.SortedIntersectCount.interSorted(ad(x), ad(y)) ==
        x.toSet.intersect(y.toSet).size.toLong
    })
  }

  test("jaccardSorted == jaccard on sorted distinct arrays (the shingled contract)") {
    val arr = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "é", "中")).map(_.distinct)
    holds(forAll(arr, arr) { (x, y) =>
      val r = Seq((x, y)).toDF("x", "y")
        .select(
          Dedup.jaccardSorted(sort_array($"x"), sort_array($"y")).as("s"),
          Dedup.jaccard($"x", $"y").as("g"))
        .head
      r.getDouble(0) == r.getDouble(1)
    }, samples = 60)
  }
}
