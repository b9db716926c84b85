package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.ValidateOps.Rule
import graft.ops.ValidateOps.Rules

/** Declarative column registry — the Spark twin of the reference's
  * `PERMIT_COLUMNS` dict (chicago/permit_cleaning.py:133-406): one spec per
  * output column carrying its position, source names and validation rule.
  * The registry drives select/rename/ordering (P1/P2) and the §2.10 rule
  * suite, so adding a column is one entry here, not edits in five places.
  *
  * @param colIdx        output position (0-based, contiguous)
  * @param name          internal/workbook name (`src` in the reference)
  * @param cityName      raw source column, if sourced (P1 rename map)
  * @param iasworldName  warehouse column, if a J4 dedupe key
  * @param rule          validation rule over the named column, if any
  */
final case class ColumnSpec(
    colIdx: Int,
    name: String,
    cityName: Option[String] = None,
    iasworldName: Option[String] = None,
    rule: Option[Column => Rule] = None
)

object PermitColumns {

  /** The 15-column "Permits" contract (FIXTURES.md A7), reference order. */
  val specs: Seq[ColumnSpec] = Seq(
    ColumnSpec(0, "errors"),
    ColumnSpec(1, "ready"),
    ColumnSpec(2, "pin", Some("pin_final"), Some("parid"),
      Some(c => Rule("pin_invalid", "PIN is not 14 digits",
        c.isNull || length(trim(c)) === 0 ||
          length(replace(c, lit("-"), lit(""))) =!= 14))),
    ColumnSpec(3, "suggested_pins", Some("suggested_pins")),
    ColumnSpec(4, "property_address", Some("property_address")),
    ColumnSpec(5, "applicant_street_address", Some("Address"), Some("note2"),
      Some(c => Rule("addr_invalid", "Address > 40 characters",
        c.isNull || length(trim(c)) === 0 || length(c) > 40))),
    ColumnSpec(6, "permit_no", Some("permit_"), Some("user28"),
      Some(c => Rules.nonBlank(c, "permit_no"))),
    ColumnSpec(7, "issue_date", Some("issue_date"), Some("permdt"),
      Some(c => Rules.nonBlank(c, "issue_date"))),
    ColumnSpec(8, "amount", Some("reported_cost"), Some("amount"),
      Some(c => Rules.amountRange(c))),
    ColumnSpec(9, "applicant_city_state_zip", Some("city_state")),
    ColumnSpec(10, "matched_keywords"),
    ColumnSpec(11, "work_description", Some("work_description"), Some("user43"),
      Some(c => Rule("desc_invalid", "Work Description > 2000 characters",
        c.isNull || length(trim(c)) === 0 || length(c) > 2000))),
    ColumnSpec(12, "applicant", Some("contact_1_name"), Some("user21"),
      Some(c => Rule("applicant_invalid", "Applicant Name > 50 characters",
        c.isNull || length(trim(c)) === 0 || length(c) > 50))),
    ColumnSpec(13, "reviewer_name"),
    ColumnSpec(14, "reviewer_notes")
  )

  /** Import-time contiguity invariant (chicago/permit_cleaning.py:411-415),
    * enforced at object init and re-checked by ColumnSpecSpec.
    */
  require(
    specs.map(_.colIdx).sorted == specs.indices.toList,
    "ColumnSpec colIdx values must be unique and contiguous from 0"
  )

  /** P1 rename map: raw city column -> internal name. */
  def renameMap: Seq[(String, String)] =
    specs.flatMap(s => s.cityName.map(_ -> s.name))

  /** J4 dedupe key map: internal name -> iasworld name. */
  def iasworldMap: Seq[(String, String)] =
    specs.flatMap(s => s.iasworldName.map(s.name -> _))

  /** Rules bound to their columns, in colIdx order (partition_permits walks
    * PERMIT_COLUMNS_BY_IDX, chicago/permit_cleaning.py:440-449).
    */
  def rules: Seq[Rule] =
    specs.sortBy(_.colIdx).flatMap(s => s.rule.map(mk => mk(col(s.name))))
}
