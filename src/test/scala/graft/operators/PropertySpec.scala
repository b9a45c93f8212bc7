package graft.operators

import graft.SparkSpec
import graft.config.{FieldRules, NotEmpty, NotNull}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants of the validation split (SURVEY §5.3):
  * ∀ inputs — OK ∪ KO == input, OK ∩ KO == ∅, and each KO row's error
  * array is exactly its failed rules. Exercises the null/empty/missing
  * corner space the fixed fixtures can't enumerate.
  *
  * Uses plain ScalaCheck generators sampled under fixed seeds (no
  * scalatest-plus bridge — not available in the offline dependency cache):
  * each seed yields one deterministic 40-row corpus, so failures are
  * reproducible by seed without a shrinking framework. */
class PropertySpec extends SparkSpec {
  import spark.implicits._
  import PropertySpec.Person

  /** Fields only — the unique id is assigned by list index afterwards, so
    * every generated corpus trivially satisfies the distinct-id
    * precondition instead of being discarded on collision. */
  val genFields: Gen[(Option[String], Option[String])] = for {
    name <- Gen.option(Gen.oneOf("", "Ana", "Luis", "Xo é", "x" * 50))
    office <- Gen.option(Gen.oneOf("", "RIO", "LIS", " "))
  } yield (name, office)

  def corpus(seed: Long): List[Person] =
    Gen.listOfN(40, genFields)
      .pureApply(Gen.Parameters.default, Seed(seed))
      .zipWithIndex
      .map { case ((n, o), i) => Person(i.toLong, n, o) }

  val rules = Seq(
    FieldRules("name", Seq(NotNull, NotEmpty)),
    FieldRules("office", Seq(NotEmpty)))

  def expectedErrors(p: Person): Seq[String] = {
    val nameNull = p.name.isEmpty
    val nameEmpty = !p.name.exists(_ != "") // null or "" fails notEmpty (null-safe semantics)
    val officeEmpty = !p.office.exists(_ != "")
    Seq(
      if (nameNull) Some("name-notNull") else None,
      if (nameEmpty) Some("name-notEmpty") else None,
      if (officeEmpty) Some("office-notEmpty") else None).flatten
  }

  test("∀ rows: OK ∪ KO == input, OK ∩ KO == ∅, KO errors are exactly the failed rules") {
    (1L to 15L).foreach { seed =>
      val people = corpus(seed)
      val df = people.toDF()
      val s = ValidationSplit.split(df, rules, persist = false)
      val okIds = s.ok.select("id").as[Long].collect().toSet
      val koRows = s.ko.select($"id", $"arraycoderrorbyfield")
        .as[(Long, Seq[String])].collect().toMap
      // partition: no loss, no overlap
      assert(okIds.intersect(koRows.keySet).isEmpty, s"seed=$seed overlap")
      assert(okIds ++ koRows.keySet == people.map(_.id).toSet, s"seed=$seed loss")
      // error arrays exact, in rule-declaration order
      people.foreach { p =>
        val exp = expectedErrors(p)
        if (exp.isEmpty) assert(okIds.contains(p.id), s"seed=$seed $p should be OK")
        else assert(koRows.get(p.id).contains(exp),
          s"seed=$seed $p expected $exp got ${koRows.get(p.id)}")
      }
    }
  }

  test("∀ texts: byte-range hash kernels equal the built-in formulations") {
    import graft.functions.{MinHashSig, NgramHash60s, Portable, SimHash60}
    val genWord = Gen.oneOf(Gen.const(""), Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("é", "漢字", "a-b", "x" * 30))
    val genText = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, genWord))
      .map(_.mkString(" "))
    (1L to 10L).foreach { seed =>
      val texts = Gen.listOfN(30, genText)
        .pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = texts.toDF("doc_id", "text")
      // shingle hashes
      val viaKernel = df.select($"doc_id",
          explode(NgramHash60s.shingleHashes($"text", Portable.ShingleN, modP = Portable.P)).as("h"))
        .as[(Long, Long)].collect().toSet
      val viaBuiltins = df
        .select($"doc_id", explode(Portable.shingles($"text")).as("s"))
        .select($"doc_id",
          pmod(conv(substring(md5($"s"), 1, 15), 16, 10).cast("long"), lit(Portable.P)).as("h"))
        .distinct().as[(Long, Long)].collect().toSet
      assert(viaKernel == viaBuiltins, s"seed=$seed shingle kernel mismatch")
      // per-row simhash vs per-token builtin + aggregate
      val shKernel = df.select($"doc_id", SimHash60.simhash60($"text"))
        .as[(Long, Long)].collect().toMap
      val shAgg = df.select($"doc_id", explode(split($"text", " ")).as("tok"))
        .select($"doc_id", conv(substring(md5($"tok"), 1, 15), 16, 10).cast("long").as("h"))
        .groupBy($"doc_id").agg(graft.functions.SimHashAgg.simhashAgg($"h").as("sh"))
        .as[(Long, Long)].collect().toMap
      assert(shKernel == shAgg, s"seed=$seed simhash kernel mismatch")
      // per-row minhash signature vs groupBy of K mins over exploded hashes
      val sigKernel = df.select($"doc_id",
          MinHashSig.minhashSig($"text", Portable.ShingleN, Dedup.A, Dedup.B, Portable.P).as("sig"))
        .filter(element_at($"sig", 1) =!= Long.MaxValue)
        .select($"doc_id", $"sig").as[(Long, Seq[Long])].collect().toMap
      val sigAgg = df
        .select($"doc_id", explode(Portable.shingles($"text")).as("s"))
        .select($"doc_id",
          pmod(conv(substring(md5($"s"), 1, 15), 16, 10).cast("long"), lit(Portable.P)).as("h"))
        .groupBy($"doc_id")
        .agg(array((0 until Dedup.K).map(k =>
          min(pmod(lit(Dedup.A(k)) * $"h" + lit(Dedup.B(k)), lit(Portable.P)))): _*).as("sig"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(sigKernel == sigAgg, s"seed=$seed minhash kernel mismatch")
    }
  }

  test("∀ texts: per-row repetition kernel equals the exploded relational form") {
    val genWord = Gen.oneOf(Gen.const(""), Gen.oneOf("a", "b", "c"),
      Gen.alphaNumStr.map(_.take(6)), Gen.oneOf("é", "漢字"))
    val genText = Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n, genWord))
      .map(_.mkString(" "))
    (1L to 10L).foreach { seed =>
      val texts = Gen.listOfN(30, genText)
        .pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val docs = texts.toDF("doc_id", "text")
      val viaKernel = docs
        .select($"doc_id", graft.functions.RepetitionStats.repetitionStats($"text").as("r"))
        .as[(Long, Seq[Double])].collect().toMap
      val rel2 = TextAnalysis.repStats(docs, 2).as[(Long, Double, Double)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      val rel3 = TextAnalysis.repStats(docs, 3).as[(Long, Double, Double)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      texts.foreach { case (id, _) =>
        val k = viaKernel(id)
        val (t2, d2) = rel2.getOrElse(id, (0.0, 0.0))
        val (t3, d3) = rel3.getOrElse(id, (0.0, 0.0))
        assert(k == Seq(t2, d2, t3, d3), s"seed=$seed doc=$id kernel $k vs rel ${Seq(t2, d2, t3, d3)}")
      }
    }
  }

  test("∀ edit scripts: snapshot diff statuses are exactly the applied edits") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genRow = for {
      a <- Gen.option(Gen.oneOf("", "x", "y", "a|0", "<null>"))
      b <- Gen.option(Gen.oneOf("", "0|b", "z"))
    } yield (a, b)
    Seq(7L, 99L, 2024L).foreach { seed =>
      val n = 60
      val base = Gen.listOfN(n, genRow).pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      // known edit script: remove k%5==0, change k%7==1 (set a to a
      // sentinel no generator emits), add fresh keys k+1000 for k%11==3
      val v2 = base.filter(_._1 % 5 != 0).map {
        case (k, _, b) if k % 7 == 1 => (k, Some("EDITED"), b)
        case r => r
      } ++ base.filter(_._1 % 11 == 3).map { case (k, a, b) => (k + 1000, a, b) }
      val got = Diff.snapshotDiff(
          base.toDF("k", "a", "b"), v2.toDF("k", "a", "b"),
          Seq("k"), Seq(col("a"), col("b")))
        .select($"k", $"status").as[(Long, String)].collect().toMap
      base.foreach { case (k, a, _) =>
        val expect =
          if (k % 5 == 0) "removed"
          // a change to the SAME value (a already "EDITED" is impossible
          // by generator; but k%7==1 rows whose a was already equal
          // would be unchanged — generator never emits EDITED)
          else if (k % 7 == 1 && !a.contains("EDITED")) "changed"
          else "unchanged"
        assert(got(k) == expect, s"seed=$seed key=$k")
      }
      base.filter(_._1 % 11 == 3).foreach { case (k, _, _) =>
        assert(got(k + 1000) == "added", s"seed=$seed added key ${k + 1000}")
      }
    }
  }

  test("∀ weighted corpora: PPS tick mass and certainty stratum hold") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genW = Gen.frequency(
      6 -> Gen.choose(1L, 50L), 2 -> Gen.const(0L), 1 -> Gen.choose(500L, 2000L))
    Seq(13L, 556L, 9090L).foreach { seed =>
      val rows = Gen.listOfN(120, genW).pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case (w, i) => (i.toLong * 3 + 1, w) } // gappy keys
      val total = rows.map(_._2).sum
      val k = 8L
      val step = math.max(1L, total / k)
      val got = TextAnalysis.ppsSystematic(rows.toDF("k", "w"), "k", "w", k)
        .select($"k", $"n_picks").as[(Long, Long)].collect().toMap
      // tick mass: total picks == floor(total/step)
      assert(got.values.sum == total / step, s"seed=$seed tick mass")
      // certainty stratum always sampled; zero weights never
      rows.foreach { case (key, w) =>
        if (w >= step) assert(got.contains(key), s"seed=$seed certainty key=$key")
        if (w == 0L) assert(!got.contains(key), s"seed=$seed zero-weight key=$key")
      }
    }
  }

  test("∀ groups: bounded min-k aggregate equals sort-and-take, any partitioning") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genRow = for {
      g <- Gen.choose(0, 5)
      v <- Gen.choose(-1000L, 1000L) // duplicates likely across rows
    } yield (g, v)
    Seq(3L, 17L, 404L).foreach { seed =>
      val rows = Gen.listOfN(400, genRow).pureApply(Gen.Parameters.default, Seed(seed))
      val expect = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).sorted.take(7)).toMap
      Seq(1, 4, 13).foreach { parts =>
        val got = rows.toDF("g", "v").repartition(parts)
          .groupBy($"g").agg(graft.functions.MinKAgg.minK($"v", 7).as("mk"))
          .as[(Int, Seq[Long])].collect().toMap
        expect.foreach { case (g, e) =>
          assert(got(g) == e, s"seed=$seed parts=$parts group=$g") }
      }
    }
  }

  test("surprisal: whole-bit law matches an independent Scala recomputation") {
    val docs = graft.sources.Tables.documents(spark, sf())
    val got = TextAnalysis.surprisal(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    graft.Caches.releaseAll()
    val corpus = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1) }
    val counts = corpus.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong)
    val total = counts.values.sum
    def bits(cnt: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(total / cnt)
    corpus.foreach { case (id, ws) =>
      val sumBits = ws.map(w => bits(counts(w))).sum
      val expect = (ws.length.toLong, sumBits, sumBits * 1000 / ws.length)
      assert(got(id) == expect, s"doc $id")
    }
    // boilerplate-vs-rare ordering: an all-stopword doc must score below
    // the corpus mean if any rare words exist (sanity of the signal)
    assert(got.values.map(_._3).toSet.size > 1, "score must discriminate")
  }

  test("bigram surprisal: whole-bit conditional law matches a Scala recomputation") {
    // hand case first: corpus "a b", "a c", "a b" — c(a b)=2, c(a c)=1,
    // ctx c(a·)=3, so bits(a b)=bitlen(3 div 2)-1=0, bits(a c)=bitlen(3)-1=1
    val hand = TextAnalysis.bigramSurprisal(
        Seq((1L, "a b"), (2L, "a c"), (3L, "a b")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    graft.Caches.releaseAll()
    assert(hand == Seq((1L, 1L, 0L, 0L), (2L, 1L, 1L, 1000L), (3L, 1L, 0L, 0L)))
    // a doc with no transition is absent, as from any LM scorer
    val one = TextAnalysis.bigramSurprisal(
      Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    graft.Caches.releaseAll()
    assert(one.map(_._1) == Seq(2L))
    // full corpus: independent recomputation of the conditional law
    val docs = graft.sources.Tables.documents(spark, sf())
    val got = TextAnalysis.bigramSurprisal(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    graft.Caches.releaseAll()
    val corpus = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))).toArray }
    val cnt2 = corpus.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong)
    val cnt1 = corpus.flatMap(_._2.map(_._1)).groupBy(identity).view
      .mapValues(_.length.toLong)
    corpus.filter(_._2.nonEmpty).foreach { case (id, bgs) =>
      val sumBits = bgs.map { bg =>
        63L - java.lang.Long.numberOfLeadingZeros(cnt1(bg._1) / cnt2(bg))
      }.sum
      val expect = (bgs.length.toLong, sumBits, sumBits * 1000 / bgs.length)
      assert(got(id) == expect, s"doc $id")
    }
    assert(corpus.count(_._2.isEmpty) ==
      corpus.length - got.size, "docs with no transition absent, all others present")
    // the signal: scores must discriminate (the corpus is not all one
    // transition distribution)
    assert(got.values.map(_._3).toSet.size > 1, "score must discriminate")
  }

  test("∀ count relations: capTopK keeps exactly min(K, |vocab|) rows, never drops above-floor mass, ranks ties deterministically") {
    val genCounts: Gen[List[Long]] =
      Gen.listOfN(60, Gen.chooseNum(1L, 8L)) // heavy tie classes on purpose
    (1L to 6L).foreach { seed =>
      val counts = genCounts.pureApply(Gen.Parameters.default, Seed(seed))
      val big = counts.zipWithIndex
        .map { case (c, i) => (s"w$i x$i", c) }.toDF("g", "cnt2")
      List(1L, 3L, counts.size / 2L, counts.size.toLong, counts.size + 50L)
        .foreach { k =>
          val out = TextAnalysis.capTopK(big, k)
            .as[(String, Long)].collect().toSeq
          assert(out.size == math.min(k, counts.size),
            s"seed=$seed k=$k: kept ${out.size}")
          // the kept multiset dominates: every dropped count <= every
          // kept count (no above-floor row was dropped)
          val keptMin = if (out.isEmpty) Long.MaxValue else out.map(_._2).min
          val dropped = counts.size - out.size
          val byCount = counts.sorted(Ordering[Long].reverse)
          assert(out.map(_._2).sorted(Ordering[Long].reverse) ==
            byCount.take(out.size),
            s"seed=$seed k=$k: kept counts are not the top-$k multiset")
          assert(dropped == 0 || byCount.drop(out.size).forall(_ <= keptMin))
          // determinism across invocations
          val again = TextAnalysis.capTopK(big, k)
            .as[(String, Long)].collect().toSeq.toSet
          assert(again == out.toSet, s"seed=$seed k=$k: tie break drifted")
        }
    }
  }

  test("sketch estimates stay within advertised error of exact answers") {
    val approx = Sketches.skApproxStats(spark, sf("sf0.01"))
      .select($"l_returnflag", $"approx_orders", $"approx_parts").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = Relational.q10DistinctCounts(spark, sf("sf0.01"))
      .select($"l_returnflag", $"n_orders", $"n_parts").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    exact.foreach { case (flag, (orders, parts)) =>
      val (ao, ap) = approx(flag)
      assert(math.abs(ao - orders).toDouble / orders < 0.03,
        s"$flag orders: approx $ao vs exact $orders (rsd 0.01)")
      assert(math.abs(ap - parts).toDouble / parts < 0.03,
        s"$flag parts: approx $ap vs exact $parts (rsd 0.01)")
    }
  }
}

object PropertySpec {
  /** Top-level so Spark can build an Encoder (inner case classes need the
    * enclosing instance's scope, which executors don't have). */
  case class Person(id: Long, name: Option[String], office: Option[String])
}
