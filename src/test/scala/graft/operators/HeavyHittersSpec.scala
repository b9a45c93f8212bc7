package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def naive(docs: DataFrame, denom: Long): Map[String, Long] = {
    val words = docs.select(explode(split($"text", " ")).as("w"))
    val n = words.count()
    words.groupBy($"w").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > n / denom)
      .as[(String, Long)].collect().toMap
  }

  test("candidate/verify equals the naive full-shuffle plan on real documents") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val got = HeavyHitters.txHeavyHitters(spark, sf())
      .as[(String, Long)].collect().toMap
    assert(got == naive(docs, 1000L))
  }

  test("exact under a TIGHT sketch: capacity barely over 1/threshold, skewed stream") {
    // zipf-ish synthetic: word i appears ~ 5000/i times; heavy tail of singletons
    val rows = (1 to 40).flatMap(i => Seq.fill(5000 / i)(s"hot$i")) ++
      (1 to 20000).map(i => s"tail$i")
    val docs = rows.grouped(97).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(7)
    val got = HeavyHitters.heavyHitters(docs, "text", thresholdDenom = 100L,
        capacity = 100)
      .as[(String, Long)].collect().toMap
    assert(got == naive(docs, 100L))
    assert(got.nonEmpty, "skewed stream must surface hitters")
    assert(!got.keys.exists(_.startsWith("tail")), "no singleton can be a hitter")
  }

  test("capacity below 1/threshold is rejected, not silently inexact") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(docs, "text", thresholdDenom = 1000L, capacity = 10)
    }
  }

  test("empty corpus yields empty output, not a crash") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(HeavyHitters.heavyHitters(docs, "text", 10L, 100).count() == 0L)
  }

  test("per-batch sketch union loses no heavy hitter (the streaming-store bound)") {
    // the startHeavyHitterStore serve recipe, run directly: split the
    // skewed corpus into 3 disjoint "micro-batches", sketch each with a
    // TIGHT capacity, union the candidates, sum the exact totals, and
    // exact-verify — must equal the naive single-pass plan, per the
    // mergeable-summaries averaging argument in the scaladoc
    val rows = (1 to 40).flatMap(i => Seq.fill(5000 / i)(s"hot$i")) ++
      (1 to 20000).map(i => s"tail$i")
    val docs = rows.grouped(97).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(7)
    val batches = (0 to 2).map(i => docs.filter(pmod($"doc_id", lit(3)) === i))
    val summaries = batches.map(b => HeavyHitters.mgSummary(b, "text", 100))
    val candidates = summaries.flatMap(_.counts.keys).distinct
    val total = summaries.map(_.total).sum
    val got = HeavyHitters.exactVerify(docs, "text", candidates, total / 100L)
      .as[(String, Long)].collect().toMap
    assert(got == naive(docs, 100L))
    assert(got.nonEmpty)
  }

  test("a null text row is tolerated, matching the relational plan") {
    val docs = Seq((1L, "a a b"), (2L, null), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = HeavyHitters.heavyHitters(docs, "text", 3L, 100)
      .as[(String, Long)].collect().toMap
    assert(got("a") == 3L)
  }
}
