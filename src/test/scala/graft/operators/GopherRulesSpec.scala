package graft.operators

import graft.SparkSpec

/** Pins each Gopher rule on planted documents that the synthetic corpus
  * cannot exercise at its boundaries — one doc per rule violation, one
  * that passes everything. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  // 60 words, mean word length ~4, no symbols, alphabetic, >= 2 stops
  private val goodText =
    (("the quick brown fox and that have with jumps over lazy dogs " * 5).trim + " end")

  private def run(rows: (Long, String)*): Map[Long, (Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)] =
    TextAnalysis.gopherRules(rows.toDF("doc_id", "text"))
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map { case (id, a, b, c, d, e, p) => id -> ((a, b, c, d, e, p)) }.toMap

  test("a clean document passes every rule") {
    val got = run(1L -> goodText)
    assert(got(1L) == ((true, true, true, true, true, true)))
  }

  test("word-count bounds: a short doc fails wc_ok only") {
    val got = run(1L -> "the cat and that have with sat on mats")
    val (wc, mwl, sym, alpha, stop, pass) = got(1L)
    assert(!wc && mwl && sym && alpha && stop && !pass)
  }

  test("mean word length: single-letter spam fails mwl_ok") {
    val text = ("a b c d e f g h i j " * 6).trim + " the of"
    val (wc, mwl, _, _, _, pass) = run(1L -> text)(1L)
    assert(wc && !mwl && !pass)
  }

  test("symbol ratio: hash/ellipsis-riddled text fails sym_ok") {
    val text = goodText.replaceAll("the", "###...###")
    val (_, _, sym, _, _, pass) = run(1L -> text)(1L)
    assert(!sym && !pass)
  }

  test("alpha fraction: numeric tables fail alpha_ok") {
    val nums = (1 to 200).map(_.toString).mkString(" ")
    val (_, _, _, alpha, _, pass) = run(1L -> (s"the of and that $nums"))(1L)
    assert(!alpha && !pass)
  }

  test("stop words: fewer than 2 of the paper's list fails stop_ok") {
    val text = ("lorem ipsum dolor sit amet " * 12).trim + " the"
    val (_, _, _, _, stop, pass) = run(1L -> text)(1L)
    assert(!stop && !pass)
  }
}
