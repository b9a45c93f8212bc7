package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Redaction semantics the oracle hash can't articulate on its own:
  * every planted span is gone from the output, the audit counts match
  * the plants, and the negative controls survive untouched. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def run() = TextAnalysis.txPiiAudit(spark, sf())
    .select($"doc_id", $"n_email", $"n_phone", $"n_ip", $"n_ssn", $"redacted_text")
    .as[(Long, Long, Long, Long, Long, String)]
    .collect().map(r => r._1 -> r).toMap

  test("planted PII redacts, counts audit it, negatives survive") {
    val rows = run()
    graft.Caches.releaseAll()
    // every planted single-type doc: exactly one span of its type,
    // zero of the others, and the raw value is gone from the text
    (0L until 60L).foreach { id =>
      val (_, ne, np, nip, ns, txt) = rows(id + 60000)
      val expect = (id % 4) match {
        case 0 => (1L, 0L, 0L, 0L); case 1 => (0L, 1L, 0L, 0L)
        case 2 => (0L, 0L, 1L, 0L); case _ => (0L, 0L, 0L, 1L)
      }
      assert((ne, np, nip, ns) == expect, s"doc $id counts")
      assert(!txt.contains("@example.com") && !txt.contains("415-555-") &&
        !txt.contains("host 10.0.") || txt.contains("[IP]"),
        s"doc $id leaked a planted span: $txt")
      val token = Seq("[EMAIL]", "[PHONE]", "[IP]", "[SSN]")((id % 4).toInt)
      assert(txt.contains(token), s"doc $id missing $token")
    }
    // the mixed doc: all four counted once, all four tokens present,
    // and BOTH negative controls untouched (3-group dotted version
    // string; non-conforming digit run)
    val (_, ne, np, nip, ns, mixed) = rows(70060L)
    assert((ne, np, nip, ns) == ((1L, 1L, 1L, 1L)), s"mixed counts ($ne,$np,$nip,$ns)")
    Seq("[EMAIL]", "[PHONE]", "[IP]", "[SSN]").foreach(t =>
      assert(mixed.contains(t), s"mixed missing $t"))
    assert(mixed.contains("version 1.2.3") && mixed.contains("order 12-34-56"),
      s"negative control redacted: $mixed")
    assert(!mixed.contains("alice@") && !mixed.contains("10.0.0.1") &&
      !mixed.contains("123-45-6789") && !mixed.contains("415-555-0000"))
    // the untouched base corpus: zero counts, text unmodified
    val base = TextAnalysis.txPiiAudit(spark, sf())
      .filter($"doc_id" < 60000)
      .agg(sum($"n_email" + $"n_phone" + $"n_ip" + $"n_ssn")).as[Long].head()
    graft.Caches.releaseAll()
    assert(base == 0, s"base corpus reported $base PII spans")
  }
}
