package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the query counts quoted in the docs to `SparkEntry` itself —
  * the hand-maintained numbers drifted in rounds 5 AND 6 (docs said
  * 111 while the surface was 115), so the count is now derived: any
  * doc line saying "<k> gated" or "<a> hash-exact + <b> rows-only"
  * must state the real surface, or CI fails on the next `sbt test`.
  *
  * Convention the docs follow: CURRENT-surface tallies always carry
  * the word "gated" (e.g. "120/120 gated (112 hash-exact + 8
  * rows-only)"); frozen historical driver records (e.g. "CORRECTNESS_r05
  * was 73/73") omit it and are deliberately not policed. */
class DocsSpec extends AnyFunSuite {

  private val n = SparkEntry.queries.size
  private val rowsOnly = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).size
  private val exact = n - rowsOnly
  private val docs = Seq("README.md", "SCALING.md", ".claude/skills/verify/SKILL.md")

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8)

  test("oracle map covers only registered queries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries with no query: $orphans")
  }

  test("doc query counts equal the real surface") {
    docs.foreach { p =>
      val txt = read(p)
      val gated = raw"(\d+) gated".r.findAllMatchIn(txt).map(_.group(1).toInt).toSeq
      assert(gated.nonEmpty, s"$p should state the gated-query count")
      assert(gated.forall(_ == n),
        s"$p claims gated counts $gated; the surface is $n — " +
          "sync the doc (and mirror any new rows-only exemptions)")
      raw"(\d+) hash-exact \+ (\d+) rows-only".r.findAllMatchIn(txt).foreach { m =>
        assert(m.group(1).toInt == exact && m.group(2).toInt == rowsOnly,
          s"$p says '${m.matched}'; actual split is $exact hash-exact + $rowsOnly rows-only")
      }
    }
  }
}
