package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the DuckDB-oracle SQL against the HUGEINT widening trap: DuckDB
  * promotes `sum(BIGINT)` to HUGEINT, which the driver's comparison
  * materializes as float64 — silently diverging from Spark's BIGINT when a
  * window sum's raw value crosses 2⁵³ (r3's only correctness failure,
  * `curate_pack_sequences`). Discipline: every windowed `sum(...) OVER`
  * must be wrapped in an explicit CAST on the oracle side. Plain aggregate
  * sums are exempt only when the engine side mirrors the widening
  * (decimal(38,0) moments) or the sum feeds a DOUBLE-cast expression.
  */
class OracleLintSpec extends AnyFunSuite {

  /** End index (exclusive) of the parenthesized group opening at `open`. */
  private def closeOf(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ => ()
      }
      i += 1
    }
    sql.length
  }

  test("every window sum in oracle SQL is CAST-wrapped (DuckDB HUGEINT trap)") {
    val sumRe = "(?i)\\bsum\\s*\\(".r
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      sumRe.findAllMatchIn(sql).flatMap { m =>
        val open = sql.indexOf('(', m.start)
        val end = closeOf(sql, open)
        val after = sql.drop(end).dropWhile(_.isWhitespace)
        val isWindowed = after.toUpperCase.startsWith("OVER")
        // the CAST discipline wraps the WHOLE window expression:
        //   CAST(sum(x) OVER (...) AS BIGINT)
        val before = sql.take(m.start).reverse.dropWhile(_.isWhitespace).reverse
        val isCast = before.toUpperCase.endsWith("CAST(")
        if (isWindowed && !isCast) Some(s"$name: ...${sql.slice(m.start, math.min(sql.length, end + 30))}...")
        else None
      }
    }
    assert(
      offenders.isEmpty,
      s"uncast window sums in oracle SQL (wrap as CAST(sum(...) OVER (...) AS BIGINT/DOUBLE)):\n${offenders.mkString("\n")}")
  }
}
