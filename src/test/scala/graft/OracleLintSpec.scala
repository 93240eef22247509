package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-SQL hygiene gate (round-5 lesson, VERDICT ask #2).
  *
  * Four round-5 oracles shipped a bare `sum(...)` output column: DuckDB
  * widens integer sums to HUGEINT, the driver harness materializes
  * HUGEINT as float64, and the value hash can never equal Spark's int64
  * even when every value is identical (q132/q142/q144/q151). A fifth
  * (q164) emitted a list column the harness canonicalizer cannot sort.
  * This lint turns both mistakes into a red test at `sbt test` time.
  *
  * Rules, per oracle SQL:
  *  1. No `list(...)` / `array_agg(...)` / `array(...)` producing array
  *     cells — the harness hashes scalar cells only.
  *  2. Every `sum(` must be "type-safe": wrapped by an enclosing
  *     `CAST(`/`ROUND(` at any level, or float-typed (its argument
  *     mentions DOUBLE), or consumed by a float-division/comparison
  *     (`/ < > = !`) so the HUGEINT never reaches an output column.
  *     Sums that survive only as intermediate GROUP BY keys are listed
  *     in [[auditedSums]] with the audit reason.
  */
class OracleLintSpec extends AnyFunSuite {

  /** (query name) -> sums audited by hand as never reaching the output:
    * windowed session-id sums consumed solely as an outer GROUP BY /
    * PARTITION BY key (both green in CORRECTNESS_r05).
    */
  private val auditedSums: Map[String, Int] = Map(
    "q150_session_window" -> 1, // sum(brk) OVER -> sid, grouped away
    "q154_session_bigrams" -> 1, // sum(new_s) OVER -> session_id, grouped away
    "q79_large_orders" -> 1, // sum(l_quantity): l_quantity is DOUBLE -> DOUBLE sum
    "q66_returned_revenue" -> 1, // CTE rev4 reaches output only via CAST(rev4 AS DOUBLE)
    "q42_dedup_simhash" -> 1 // CTE vote consumed only by `vote > 0` comparisons
  )

  /** Open-paren function-name stack at position `i` (innermost last). */
  private def callStack(sql: String, i: Int): List[String] = {
    var stack = List.empty[String]
    var p = 0
    while (p < i) {
      sql.charAt(p) match {
        case '(' =>
          val prefix = sql.substring(0, p)
          val name = "([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
            .findFirstMatchIn(prefix).map(_.group(1).toLowerCase).getOrElse("")
          stack = name :: stack
        case ')' => if (stack.nonEmpty) stack = stack.tail
        case _ =>
      }
      p += 1
    }
    stack
  }

  /** Index just past the close paren matching the open paren at `open`. */
  private def matchParen(sql: String, open: Int): Int = {
    var depth = 0
    var p = open
    while (p < sql.length) {
      sql.charAt(p) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return p + 1
        case _ =>
      }
      p += 1
    }
    sql.length
  }

  /** True when the sum at (start, openParen) can't leak HUGEINT. */
  private def sumIsSafe(sql: String, start: Int, open: Int): Boolean = {
    val stack = callStack(sql, start)
    if (stack.exists(n => n == "cast" || n == "round")) return true
    val end = matchParen(sql, open)
    if (sql.substring(open, end).toLowerCase.contains("double")) return true
    // Walk forward: pop enclosing call levels; a float-division or
    // comparison consumer is safe; anything else (AS alias, select-list
    // comma, arithmetic, OVER, END) can surface the HUGEINT.
    var p = end
    while (p < sql.length) {
      val c = sql.charAt(p)
      if (c.isWhitespace) p += 1
      else if (c == ')') p += 1 // result feeds an enclosing non-cast call
      else return "/<>=!".contains(c)
    }
    false
  }

  test("no oracle emits an array column (harness hashes scalars only)") {
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql)
          if "(?i)\\b(list|array_agg|array)\\s*\\(".r
            .findFirstIn(sql).isDefined =>
        name
    }
    assert(bad.isEmpty,
      s"array-producing oracle SQL (reshape to scalar rows or a joined string): ${bad.toSeq.sorted.mkString(", ")}")
  }

  test("every oracle sum( is CAST/round-wrapped, float-typed, or consumed safely") {
    val sumRe = "(?i)\\bsum\\s*\\(".r
    val offenders = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      val unsafe = sumRe.findAllMatchIn(sql).count { m =>
        !sumIsSafe(sql, m.start, sql.indexOf('(', m.start))
      }
      val allowed = auditedSums.getOrElse(name, 0)
      if (unsafe > allowed) Some(s"$name ($unsafe unsafe sum, $allowed audited)")
      else None
    }
    assert(offenders.isEmpty,
      "bare integer sum( in oracle SQL — DuckDB returns HUGEINT and the " +
        "harness hash can never match Spark's int64. Wrap in CAST(... AS " +
        s"BIGINT): ${offenders.sorted.mkString("; ")}")
  }
}
