package graft.pipeline

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** §3.2 review-ingestion chain on micro-fixtures. */
class ReviewIngestPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def sheet = Seq(
    // flagged valid row → upload
    ("000000001", "12-34-567-890-1234", "2024-03-05", "100 MAIN", "ok", "ACME", "500", true),
    // flagged but pin not in universe → review
    ("000000002", "99999999999999", "2024-03-06", "200 OAK", "ok", "BOB", "250", true),
    // not flagged → qc copy only
    ("000000003", "12345678901234", "2024-03-07", "300 PINE", "ok", "CARL", "50", false)
  ).toDF("permit_no", "pin", "issue_date", "address", "notes", "applicant", "amount", "flagged")

  private def universe = Seq("12345678901234").toDF("pin")

  test("run: flag filter, normalize, re-validate, batch upload, qc leftover") {
    val (upload, review, qc) = ReviewIngestPipeline.run(sheet, universe)
    val up = upload.collect()
    assert(up.length == 1 && up.head.getAs[String]("permit_no") == "000000001")
    assert(up.head.getAs[String]("pin") == "12345678901234") // hyphens stripped
    assert(up.head.getAs[String]("issue_date") == "03/05/2024") // MDY-padded render
    assert(up.head.getAs[Long]("lline") == 1L)
    val rev = review.collect()
    assert(rev.length == 1 && !rev.head.getAs[Boolean]("pin14_in_data"))
    val qcRows = qc.collect()
    assert(qcRows.length == 1 && qcRows.head.getAs[String]("permit_no") == "000000003")
  }

  test("dateRange spans the sheet's parseable dates") {
    val r = ReviewIngestPipeline.dateRange(sheet, "issue_date").collect().head
    assert(r.getString(0) == "2024-03-05" && r.getString(1) == "2024-03-07")
  }
}
