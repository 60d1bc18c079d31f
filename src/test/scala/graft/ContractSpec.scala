package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that a silent mistake could break:
  * `SparkEntry.queries` is built by merging three maps with `++`,
  * which OVERWRITES on key collision — a copy-pasted query name would
  * silently drop an operator from the correctness gate.
  */
class ContractSpec extends AnyFunSuite {

  test("query-map merge loses nothing (no duplicate names across entry files)") {
    val base = 19 // the q01-q19 star-schema entries defined in SparkEntry
    val expected = base + TrainingEntries.queries.size + AirlineEntries.queries.size
    assert(SparkEntry.queries.size === expected,
      "a duplicate query name collapsed during the map merge")
  }

  test("every oracle SQL has a runnable query behind it") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned === Set.empty[String])
  }

  test("oracle SQL is well-formed for the driver's JSON dump") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // Verify.q escapes control chars, but a stray null byte would
      // still corrupt the dump DuckDB side
      assert(!sql.contains('\u0000'), s"$name: NUL in oracle sql")
    }
  }

  test("every query is oracle-gated (no rows-only entries remain)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set.empty[String],
      "a query lost its oracle row (every operator must be hash-gated)")
  }
}
