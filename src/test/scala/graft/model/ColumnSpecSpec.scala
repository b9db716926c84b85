package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** The PERMIT_COLUMNS contiguity invariant (chicago/permit_cleaning.py:411-415)
  * as a unit test, per SURVEY.md §7.2.
  */
class ColumnSpecSpec extends AnyFunSuite {

  test("colIdx values are unique and contiguous from 0") {
    assert(PermitColumns.specs.map(_.colIdx).sorted == PermitColumns.specs.indices.toList)
  }

  test("renameMap covers every sourced column exactly once") {
    val m = PermitColumns.renameMap
    assert(m.map(_._1).distinct.size == m.size)
    assert(m.toMap.get("pin_final").contains("pin"))
    assert(m.toMap.get("permit_").contains("permit_no"))
  }

  test("iasworldMap binds the 7 dedupe keys") {
    val m = PermitColumns.iasworldMap.toMap
    assert(m("pin") == "parid" && m("issue_date") == "permdt" && m("amount") == "amount")
    assert(m.size == 7)
  }

  test("rules bind one rule per validated column in colIdx order") {
    val rs = PermitColumns.rules
    assert(rs.size == PermitColumns.specs.count(_.rule.isDefined))
    assert(rs.head.name == "pin_invalid") // lowest colIdx with a rule
  }
}
