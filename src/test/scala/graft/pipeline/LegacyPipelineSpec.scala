package graft.pipeline

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** §3.3 legacy wide-sheet chain on micro-fixtures. */
class LegacyPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  // wide sheet: PIN1..PIN2, Excel-serial dates, 9/10-digit permit numbers
  private def sheet = Seq(
    // P-1: two pins, one hyphenated dup of the other → collapses after normalize
    ("000000001", 45000, "100 MAIN ST", "note a", null, "ACME", "100",
     "12345678901234", "12-34-567-890-1234"),
    // P-2: 13-digit pin → normalized by prepending 0; crosswalk remaps it
    ("0000000002", 45001, "200 OAK AVE", "note b", "REINSTATED", "BOB", "250",
     "2345678901234", null),
    // P-3: all-zero pin → blacklisted; row has no other pin → drops entirely
    ("000000003", 45002, "300 PINE RD", "note c", null, "CARL", "50",
     "00000000000000", null),
    // P-4: no pins at all → survives as null-pin row → review
    ("0000000004", 45003, "400 ELM ST", "note d", null, "DANA", "75",
     null, null)
  ).toDF("permit_no", "date_serial", "address", "notes", "reinstated_note",
         "applicant", "amount", "PIN1", "PIN2")

  private def crosswalk =
    Seq(("02345678901234", "99999999999999")).toDF("original_pin", "meta_pin")

  private def universe =
    Seq("12345678901234", "99999999999999").toDF("pin")

  test("run: dedupe after normalize, crosswalk remap, reinstated overwrite, flag split") {
    val (upload, review) = LegacyPipeline.run(sheet, Seq("PIN1", "PIN2"), crosswalk, universe)
    val up = upload.collect()
    // P-1 collapses to one row (both pins normalize to the same), amount 100 valid
    // P-2 remapped to 99999999999999 (in universe), amount 250 valid
    assert(up.length == 2)
    val p2 = upload.filter($"permit_no" === "0000000002").collect().head
    assert(p2.getAs[String]("pin") == "99999999999999")
    assert(p2.getAs[String]("notes") == "REINSTATED") // P12 overwrite
    // buckets + 1-based renumbering present
    assert(up.forall(r => r.getAs[Long]("lline") >= 1L))
    // P-3 blacklisted away entirely; P-4 null-pin lands in review
    val rev = review.collect()
    assert(rev.length == 1)
    assert(rev.head.getAs[String]("permit_no") == "0000000004")
    assert(!rev.head.getAs[Boolean]("valid_pin"))
    assert(rev.head.getAs[Boolean]("valid_amount")) // 75 is fine — only pin failed
  }

  test("expandPins keeps all-null-pin rows and drops per-slot nulls") {
    val out = LegacyPipeline.expandPins(sheet, Seq("PIN1", "PIN2"))
    // P-1 contributes 2 rows, P-2 and P-3 one each, P-4 one null-pin row
    assert(out.count() == 5)
    assert(out.filter($"pin".isNull).count() == 1)
  }

  test("excel serial dates convert with origin 1899-12-30") {
    val out = LegacyPipeline.normalize(LegacyPipeline.expandPins(sheet, Seq("PIN1", "PIN2")))
    val d = out.filter($"permit_no" === "000000001").select($"issue_date").collect().head.getString(0)
    assert(d == "2023-03-15") // serial 45000
  }
}
