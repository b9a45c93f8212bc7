package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE training must equal an independent scalar reimplementation of
  * the reference algorithm (greedy argmax with lexicographic
  * tie-break, one-pass left-to-right replace) on both a hand corpus
  * and real sf words, and encoding must reconstruct its input. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent scalar BPE over a word-frequency dict. */
  private def model(dict: Map[String, Long],
                    rounds: Int): Seq[(String, String, Long)] = {
    var vocab = dict.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    for (_ <- 1 to rounds if continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, r, n))
        vocab = vocab.map { case (syms, c) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == l && s == r) acc(acc.size - 1) = l + r
            else acc += s
          }
          (acc.toVector, c)
        }
      }
    }
    out.toSeq
  }

  test("hand corpus: merges equal the scalar reference, in order") {
    // Sennrich-style: 'lo' then 'low' should win early
    val docs = Seq(
      (1L, "low low low lower lower newest newest newest newest widest"),
      (2L, "low lowest newest widest widest")).toDF("doc_id", "text")
    val dict = Bpe.wordDict(docs).as[(String, Long)].collect().toMap
    val expect = model(dict, 8)
    val m = Bpe.train(docs, rounds = 8)
    assert(m.merges.map(x => (x.left, x.right, x.cnt)) == expect)
    // spot-check the first merge by hand: 'e','s' appears in newest(5),
    // widest(3), lowest(1) = 9, the most frequent pair
    assert((m.merges.head.left, m.merges.head.right) == ("e", "s"))
    assert(m.merges.head.cnt == 9L)
  }

  test("sf0.001 corpus: distributed training equals the scalar model") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val dict = Bpe.wordDict(docs).as[(String, Long)].collect().toMap
    val m = Bpe.train(docs, rounds = 15)
    assert(m.merges.map(x => (x.left, x.right, x.cnt)) == model(dict, 15))
  }

  test("encode reconstructs input; merged tokens shrink sequences") {
    val docs = Seq((1L, "banana bandana banana")).toDF("doc_id", "text")
    val m = Bpe.train(docs, rounds = 5)
    val enc = Bpe.encode(docs, m)
      .select(col("word"), concat_ws("", col("tokens")).as("glued"),
        size(col("tokens")).as("ntok"), length(col("word")).as("nchr"))
      .as[(String, String, Int, Int)].collect()
    enc.foreach { case (w, glued, ntok, nchr) =>
      assert(glued == w, s"tokens of $w reassemble to $glued")
      assert(ntok < nchr, s"$w: 5 merges should compress below chars")
    }
    // unseen word falls back to chars
    val un = Bpe.encode(Seq((2L, "zzq")).toDF("doc_id", "text"), m)
      .select(col("tokens")).as[Seq[String]].head()
    assert(un == Seq("z", "z", "q"))
  }

  test("tokEncode: persisted-dict gate equals in-memory encode") {
    val dir = sf()
    val gated = Bpe.tokEncode(spark, dir)
      .as[(Long, String, String)].collect().toSeq.sorted
    val docs = graft.sources.Tables.documents(spark, dir)
    val m = Bpe.train(docs)
    val direct = Bpe.encode(docs, m)
      .select(col("doc_id"), col("word"),
        concat_ws(" ", col("tokens")).as("tokens"))
      .as[(Long, String, String)].collect().toSeq.sorted
    assert(gated == direct,
      "the persisted-dict join must reproduce the broadcast encode exactly")
  }
}
