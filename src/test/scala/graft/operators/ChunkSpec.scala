package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("hand-computed windows: width 3 stride 2, tail and singleton chunks") {
    val got = TextAnalysis.chunkOverlap(docs(1L -> "a b c d e"), 3, 2)
      .orderBy($"chunk_idx")
      .select($"chunk_idx", $"chunk_start", $"n_chunk_words", $"chunk_text")
      .as[(Int, Int, Int, String)].collect().toSeq
    assert(got == Seq((0, 1, 3, "a b c"), (1, 3, 3, "c d e"), (2, 5, 1, "e")))
  }

  test("empty text still yields exactly one (empty) chunk, not zero rows") {
    val got = TextAnalysis.chunkOverlap(docs(1L -> ""), 3, 2)
      .select($"chunk_idx", $"n_chunk_words", $"chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(got == Seq((0, 1, "")))
  }

  test("stride == width partitions exactly: concatenation reconstructs the text") {
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id", $"text").limit(50)
    val rebuilt = TextAnalysis.chunkOverlap(corpus, 7, 7)
      .groupBy($"doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(
        struct($"chunk_idx", $"chunk_text"))).getField("chunk_text"))
        .as("rebuilt"))
    val bad = corpus.join(rebuilt, "doc_id")
      .filter($"text" =!= $"rebuilt").count()
    assert(bad == 0L)
  }

  test("overlap bound: total chunk words <= (width/stride) * n_words + width") {
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id", $"text")
    val perDoc = TextAnalysis.chunkOverlap(corpus, 64, 48)
      .groupBy($"doc_id").agg(sum($"n_chunk_words").as("chunk_words"))
      .join(corpus.select($"doc_id",
        size(graft.functions.Portable.words($"text")).as("n_words")), "doc_id")
    val violations = perDoc
      .filter($"chunk_words" > $"n_words" * 64.0 / 48.0 + 64.0).count()
    assert(violations == 0L)
  }

  test("the chunk plan is shuffle-free (runs at scan speed)") {
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id", $"text")
    val plan = TextAnalysis.chunkOverlap(corpus, 64, 48)
      .queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"unexpected shuffle in:\n$plan")
  }
}
