package graft

import org.scalatest.funsuite.AnyFunSuite

/** Grep-level pin on the determinism contract (SURVEY §15's two-tier
  * rule): a score chain that sums 6dp-rounded contributions with a raw
  * float `sum` is order-dependent at the 4dp output boundary — the r10
  * `kw_search_asof` red-row class. The closure is
  * [[graft.operators.KeywordSearch.fixedPointSum6]] (associative
  * integer numerators, combiner-preserving) on the Spark side and its
  * `fixedPointSum6Sql` twin (or an explicit `ORDER BY` inside the
  * aggregate) on the DuckDB-oracle side. This spec fails the build the
  * moment a new chain reintroduces the raw form, so the contract
  * survives code motion without relying on review memory.
  */
class ScoreChainLintSpec extends AnyFunSuite {

  private def scalaSources(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).getOrElse(Array.empty)
    kids.filter(_.isDirectory).flatMap(scalaSources).toSeq ++
      kids.filter(f => f.isFile && f.getName.endsWith(".scala")).toSeq
  }

  test("no raw sum(round(...)) score chain anywhere in src/main") {
    val root = new java.io.File("src/main/scala")
    assert(root.isDirectory, s"expected to run from the repo root, cwd=${
      new java.io.File(".").getAbsolutePath}")
    val offenders = for {
      f <- scalaSources(root)
      (line, i) <- scala.io.Source.fromFile(f, "UTF-8").getLines().zipWithIndex.toSeq
      if line.contains("sum(round(")
      trimmed = line.trim
      // stripMargin SQL lines (oracle side) are exempt ONLY when the
      // aggregate pins its own order — DuckDB's parallel sum is no more
      // order-stable than Spark's
      isSql = trimmed.startsWith("|")
      if !isSql || !(line.contains("ORDER BY") ||
        nextLines(f, i).exists(_.contains("ORDER BY")))
    } yield s"${f.getPath}:${i + 1}: $trimmed"
    assert(offenders.isEmpty,
      "raw sum(round(...)) score chains found — use " +
        "KeywordSearch.fixedPointSum6 / fixedPointSum6Sql (or an ORDER BY " +
        "inside a bounded-group SQL aggregate):\n" + offenders.mkString("\n"))
  }

  /** A margin-SQL aggregate may wrap its ORDER BY onto the next line. */
  private def nextLines(f: java.io.File, i: Int): Seq[String] =
    scala.io.Source.fromFile(f, "UTF-8").getLines().slice(i + 1, i + 3).toSeq
}
