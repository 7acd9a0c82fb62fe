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
  * survives code motion without relying on review memory. It also
  * polices the r13 helper split: the sign-aware
  * `fixedPointSum6Signed` costs ~2× wall on posting-volume chains
  * (the r12→r13 `kw_search_bm25` regression), so a caller must declare
  * its signed domain explicitly — hot nonnegative chains stay on the
  * plain form.
  */
class ScoreChainLintSpec extends AnyFunSuite {

  private def scalaSources(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).getOrElse(Array.empty)
    kids.filter(_.isDirectory).flatMap(scalaSources).toSeq ++
      kids.filter(f => f.isFile && f.getName.endsWith(".scala")).toSeq
  }

  private def lines(f: java.io.File): IndexedSeq[String] =
    scala.io.Source.fromFile(f, "UTF-8").getLines().toIndexedSeq

  /** The text of the `sum(...)` call starting at (row, colIdx): from its
    * opening paren to the matching close, following wrapped margin
    * lines. The ORDER-BY exemption must belong to THIS aggregate — an
    * unrelated ORDER BY two lines below (an outer ranking clause) must
    * not exempt a genuinely order-dependent chain, and an aggregate
    * whose own ORDER BY wraps three lines down must not false-positive.
    */
  private def sumSpan(ls: IndexedSeq[String], row: Int, colIdx: Int): String = {
    val sb = new StringBuilder
    var depth = 0
    var started = false
    var r = row
    var c = colIdx
    while (r < ls.length && (!started || depth > 0)) {
      val line = ls(r)
      while (c < line.length && (!started || depth > 0)) {
        val ch = line.charAt(c)
        if (ch == '(') { depth += 1; started = true }
        else if (ch == ')') depth -= 1
        sb.append(ch)
        c += 1
      }
      sb.append('\n')
      r += 1
      c = 0
    }
    sb.toString
  }

  test("no raw sum(round(...)) score chain anywhere in src/main") {
    val root = new java.io.File("src/main/scala")
    assert(root.isDirectory, s"expected to run from the repo root, cwd=${
      new java.io.File(".").getAbsolutePath}")
    val offenders = for {
      f <- scalaSources(root)
      ls = lines(f)
      (line, i) <- ls.zipWithIndex
      idx = line.indexOf("sum(round(")
      if idx >= 0
      trimmed = line.trim
      // stripMargin SQL lines (oracle side) are exempt ONLY when the
      // aggregate pins its own order — DuckDB's parallel sum is no more
      // order-stable than Spark's. The exemption is anchored to the
      // sum's own paren span, not a nearby-line substring.
      isSql = trimmed.startsWith("|")
      if !isSql || !sumSpan(ls, i, idx + "sum".length).contains("ORDER BY")
    } yield s"${f.getPath}:${i + 1}: $trimmed"
    assert(offenders.isEmpty,
      "raw sum(round(...)) score chains found — use " +
        "KeywordSearch.fixedPointSum6 / fixedPointSum6Sql (or an ORDER BY " +
        "inside the sum's own parenthesis span):\n" + offenders.mkString("\n"))
  }

  test("fixedPointSum6Signed callers declare their signed domain") {
    val root = new java.io.File("src/main/scala")
    val offenders = for {
      f <- scalaSources(root)
      ls = lines(f)
      (line, i) <- ls.zipWithIndex
      if line.contains("fixedPointSum6Signed") &&
        !f.getName.equals("KeywordSearch.scala") // the definition site
      // a caller is exempt only when it (or the two lines above it)
      // carries an explicit `signed domain:` justification — so a hot
      // nonnegative chain can't drift onto the 2×-cost form silently
      ctx = ls.slice(math.max(0, i - 2), i + 1).mkString("\n")
      if !ctx.contains("signed domain:")
    } yield s"${f.getPath}:${i + 1}: ${line.trim}"
    assert(offenders.isEmpty,
      "fixedPointSum6Signed used without a `// signed domain:` " +
        "justification — nonnegative chains must use fixedPointSum6 " +
        "(the signed form costs ~2× on posting-volume chains):\n" +
        offenders.mkString("\n"))
  }
}
