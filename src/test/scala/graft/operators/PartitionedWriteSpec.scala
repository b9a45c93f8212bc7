package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedWriteSpec extends SparkSpec {
  import spark.implicits._

  test("partition predicate becomes directory pruning, not a data filter") {
    val dir = Files.createTempDirectory("part_prune").toString
    PartitionedWrite.writePartitioned(
      spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
        .select($"doc_id", $"lang", $"n_chars"),
      dir, Seq("lang"))

    // directory layout: one subdir per language, no flat files
    val subdirs = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .map(_.getName).toSet
    assert(subdirs == Set("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh"))

    val pruned = spark.read.parquet(dir).filter($"lang" === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("= en"),
      s"predicate must land in PartitionFilters:\n$plan")

    val got = pruned.select($"doc_id").as[Long].collect().toSet
    val want = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
      .filter($"lang" === "en").select($"doc_id").as[Long].collect().toSet
    assert(got == want)
  }

  test("round-trip content equals the flat filtered table") {
    val got = PartitionedWrite.k4PartitionPrune(spark, sf("sf0.01"))
      .as[(Long, String, Long)].collect().toSeq
    val want = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
      .filter($"lang" === "en")
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == want)
  }
}
