package graft

import org.scalatest.funsuite.AnyFunSuite

/** The blueprint documents' coverage numbers must match the code
  * (VERDICT r6 "What's wrong" #3: three documents carried three
  * different query counts). COVERAGE.md is the single numeric source
  * of truth — its totals line is derived-checked against
  * `SparkEntry.all` here, and the other blueprint docs must NOT carry
  * their own (driftable) copies of the count.
  */
class DocsSpec extends AnyFunSuite {

  private def read(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/root/repo/$name")), "UTF-8")

  test("COVERAGE.md totals line equals the declared-query registry") {
    val totalsRe =
      """Totals: (\d+) oracle-checked \+ (\d+) rows-only = (\d+) declared queries""".r
    val ms = totalsRe.findAllMatchIn(read("COVERAGE.md")).toSeq
    assert(ms.size === 1, "COVERAGE.md must carry exactly one totals line")
    val oracle = SparkEntry.all.count(_.oracle.isDefined)
    val rowsOnly = SparkEntry.all.count(_.oracle.isEmpty)
    assert(ms.head.group(1).toInt === oracle, s"oracle-checked count is $oracle")
    assert(ms.head.group(2).toInt === rowsOnly, s"rows-only count is $rowsOnly")
    assert(ms.head.group(3).toInt === SparkEntry.all.size,
      s"declared total is ${SparkEntry.all.size}")
  }

  test("SURVEY.md and README.md defer to COVERAGE.md instead of carrying their own counts") {
    val countClaim = """\d+\s+declared\s+quer""".r
    for (f <- Seq("SURVEY.md", "README.md")) {
      assert(countClaim.findFirstIn(read(f)).isEmpty,
        s"$f carries its own declared-query count — COVERAGE.md is the single source")
    }
  }

  test("declared query names are unique and every headline query exists") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicate names: ${names.diff(names.distinct).distinct}")
    val missing = SparkEntry.headline.filterNot(names.contains)
    assert(missing.isEmpty, s"headline references unknown queries: $missing")
  }

  test("every declared query name appears in COVERAGE.md's inventory") {
    // VERDICT r7 task 5: the totals line is derived-checked above, but two
    // line-by-line rows were still skipped in r7 — names, not just counts,
    // are the coverage contract.
    val coverage = read("COVERAGE.md")
    val missing = SparkEntry.all.map(_.name).filterNot(n => coverage.contains(s"`$n`"))
    assert(missing.isEmpty,
      s"COVERAGE.md has no row mentioning: ${missing.mkString(", ")}")
  }
}
