package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself (BASELINE.md): every oracle belongs to
  * a real query, names stay stable, and the smoke entry yields rows.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle (no rows-only checks remain)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("oracle SQL contains no tabs/CR that would break the driver's JSON") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\r"), s"$name oracle has CR")
    }
  }

  test("smoke entry returns rows on sf0.001") {
    val n = SparkEntry.entry(TestSpark.spark).count()
    assert(n > 0, "driver smoke gate: entry() must return rows")
  }
}
