package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only a 2000-char stdout tail (minus sbt's ~70-char
  * success trailer), and parses the LAST JSON line for the round's bench
  * record. Bench prints a compact 2dp line with a 1dp fallback — this
  * spec proves the FALLBACK always fits, so growing the query map can
  * never silently break the driver's parse again (BENCH_r04 shipped
  * parsed:null exactly that way). */
class BenchLineSpec extends AnyFunSuite {

  test("worst-case compact bench line fits the driver tail window") {
    val oracleOnly = Set("pair_uptime", "ann_lsh", "embedding_neardup")
    val names = SparkEntry.queries.keys.toSeq.filterNot(oracleOnly)
    // Bench's LAST fallback keeps the 40 slowest queries; worst case =
    // the 40 LONGEST names, every value printing like "9999.9"
    val worst40 = names.sortBy(-_.length).take(40)
    val queries = worst40.map(n => "\"" + n + "\":9999.9")
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":99999.99,"unit":"sec","queries":$queries,"truncated":999,"sf":"sf0.001"}"""
    assert(line.length <= 1900,
      s"bench fallback line ${line.length} chars — trim query names or " +
        "move more entries to oracle-only before the driver parse breaks")
  }

  test("every query has an oracle entry or a documented rows-only check") {
    // queries without oracleSql get a weaker rows-only gate; keep that
    // set explicit so a forgotten oracle is a test failure, not a silent
    // downgrade of the correctness story. (compression_ratio moved OUT
    // of the gate map entirely in r8 — no DuckDB twin exists; it is
    // pinned by TextKernelsSpec + PlanAuditSpec instead.)
    val documented = Set.empty[String]
    val rowsOnly =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- documented
    assert(rowsOnly.isEmpty,
      s"queries without oracle SQL: $rowsOnly — add oracles or extend " +
        "the documented rows-only allowlist")
  }
}
