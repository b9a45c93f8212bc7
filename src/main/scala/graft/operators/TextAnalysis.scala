package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline: token statistics,
  * n-gram-heuristic language ID, quality scoring, and document
  * fingerprinting — all narrow, codegen'd projections (zero shuffles; at
  * 100 TB these run at scan speed).
  *
  * No reference counterpart (the reference has no text functions beyond
  * whatever `expr()` admits); these are the BASELINE.json extension
  * surface. Every count is integer-exact and every ratio is one IEEE
  * double division, so the DuckDB oracles match bit-for-bit.
  */
object TextAnalysis {

  /** Language stopword profiles for the n-gram/stopword heuristic. One
    * regex per language, identical string in Spark and DuckDB (both RE2-
    * compatible `\b` word boundaries). */
  val langProfiles: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\\b",
    "en" -> "\\b(the|and|of|to|is|in|that|it|for|was)\\b",
    "es" -> "\\b(el|la|de|que|y|en|un|una|es|por)\\b",
    "fr" -> "\\b(le|la|les|et|de|un|une|est|que|pour)\\b",
    // \x{...} escapes — the one codepoint syntax Java regex and RE2 share
    // (\uXXXX is Java-only).
    "zh" -> "[\\x{4e00}-\\x{9fff}]")

  private def scoreCol(re: String): Column =
    regexp_count(col("text"), lit(re))
  private def scoreSql(re: String): String =
    s"CAST(len(regexp_extract_all(text, '$re')) AS INT)"

  /** Token statistics: whitespace words, BPE-ish alnum tokens, char
    * classes, average word length. */
  def txTokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(Portable.words(col("text"))).as("n_words"),
        regexp_count(col("text"), lit("[A-Za-z0-9]+")).as("n_tokens"),
        length(col("text")).as("n_chars_obs"),
        length(regexp_replace(col("text"), lit("\\s"), lit(""))).as("n_nonspace"),
        (length(regexp_replace(col("text"), lit("\\s"), lit(""))).cast("double")
          / size(Portable.words(col("text")))).as("avg_word_len"))
      .orderBy(col("doc_id"))

  val txTokenStatsSql: String = """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_words,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_obs,
           CAST(length(regexp_replace(text, '\s', '', 'g')) AS INT) AS n_nonspace,
           CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_word_len
    FROM documents ORDER BY doc_id"""

  /** Stopword-profile language ID: score each language's profile regex,
    * argmax with a fixed alphabetical tie-break; 'und' when NO profile
    * matched at all (m = 0 — without the guard the argmax chain would
    * label every out-of-profile document with the alphabetically first
    * language, since some score always equals a zero max). */
  def txLangId(spark: SparkSession, dir: String): DataFrame = {
    val scores = langProfiles.map { case (l, re) => scoreCol(re).as(s"s_$l") }
    val m = greatest(langProfiles.map { case (l, _) => col(s"s_$l") }: _*)
    val predicted = when(col("m") === 0, lit("und")).otherwise(
      langProfiles.foldRight(lit("und")) { case ((l, _), elze) =>
        when(col(s"s_$l") === col("m"), lit(l)).otherwise(elze)
      })
    Tables.documents(spark, dir)
      .select(col("doc_id") +: col("lang").as("actual") +: scores: _*)
      .withColumn("m", m)
      .withColumn("predicted", predicted)
      .select("doc_id", "actual", "predicted", "m")
      .orderBy(col("doc_id"))
  }

  val txLangIdSql: String = {
    val scoreDefs = langProfiles.map { case (l, re) => s"${scoreSql(re)} AS s_$l" }.mkString(",\n           ")
    val m = langProfiles.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val caseChain = ("WHEN m = 0 THEN 'und'" +:
      langProfiles.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }).mkString(" ")
    s"""
    WITH s AS (
      SELECT doc_id, lang AS actual,
           $scoreDefs
      FROM documents)
    SELECT doc_id, actual, CASE $caseChain ELSE 'und' END AS predicted,
           CAST(m AS INT) AS m
    FROM (SELECT *, $m AS m FROM s)
    ORDER BY doc_id"""
  }

  /** The composite quality column over a `text` column — factored so the
    * quota/selection operators ([[txDomainCap]]) rank by the SAME score
    * the `tx_quality_score` gate hash-checks (which also proves the
    * value bit-identical across engines: pure +,*,/ of small rationals,
    * no transcendentals). */
  private[operators] def quality: Column = {
    val nChars = length(col("text")).cast("double")
    val nWords = size(Portable.words(col("text"))).cast("double")
    val punct = regexp_count(col("text"), lit("[.,!?;:]")).cast("double")
    val stop = regexp_count(col("text"), lit(langProfiles.toMap.apply("en"))).cast("double")
    least(nWords / lit(100.0), lit(1.0)) * lit(0.5) +
      least(stop / nWords * lit(10.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(punct / nChars * lit(20.0), lit(1.0))) * lit(0.2)
  }

  /** Quality scoring: length/punctuation/stopword/digit ratios folded into
    * one composite score (weights arbitrary but fixed). */
  def txQualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nWords = size(Portable.words(col("text"))).cast("double")
    val punct = regexp_count(col("text"), lit("[.,!?;:]")).cast("double")
    val digits = regexp_count(col("text"), lit("[0-9]")).cast("double")
    val stop = regexp_count(col("text"), lit(langProfiles.toMap.apply("en"))).cast("double")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (punct / nChars).as("punct_ratio"),
        (digits / nChars).as("digit_ratio"),
        (stop / nWords).as("stopword_ratio"),
        quality.as("quality"))
      .orderBy(col("doc_id"))
  }

  /** The composite quality formula over a text expression, as ONE SQL
    * scalar — the oracle-side twin of [[quality]], shared by the
    * per-doc score oracle and the survivor-selection oracle
    * (`dd_cluster_keep_best`) so the formula cannot drift between
    * them. Pure +,*,/ of small rationals and least() — bit-identical
    * doubles in both engines. */
  def qualitySql(x: String): String = {
    val en = langProfiles.toMap.apply("en")
    val nChars = s"CAST(length($x) AS DOUBLE)"
    val nWords = s"CAST(len(string_split($x, ' ')) AS DOUBLE)"
    val punct = s"CAST(len(regexp_extract_all($x, '[.,!?;:]')) AS DOUBLE)"
    val stop = s"CAST(len(regexp_extract_all($x, '$en')) AS DOUBLE)"
    s"""(least($nWords / 100.0, 1.0) * 0.5
             + least($stop / $nWords * 10.0, 1.0) * 0.3
             + (1.0 - least($punct / $nChars * 20.0, 1.0)) * 0.2)"""
  }

  val txQualityScoreSql: String = {
    val en = langProfiles.toMap.apply("en")
    s"""
    WITH c AS (
      SELECT doc_id, text,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
             CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS punct,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS digits,
             CAST(len(regexp_extract_all(text, '$en')) AS DOUBLE) AS stop
      FROM documents)
    SELECT doc_id,
           punct / n_chars AS punct_ratio,
           digits / n_chars AS digit_ratio,
           stop / n_words AS stopword_ratio,
           ${qualitySql("text")} AS quality
    FROM c ORDER BY doc_id"""
  }

  /** Gopher-style rule filter (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * appendix A — the MassiveText quality heuristics), the
    * published-rule counterpart of the learned [[QualityClassifier]]
    * and the composite [[quality]] score: per document, one boolean per
    * rule plus the conjunction, so downstream selection can either hard
    * filter on `pass` or inspect which rule fired (the ablation-driven
    * workflow the paper describes).
    *
    * Rules kept (all computable bit-identically in both engines —
    * integer counts and count/count double ratios, no transcendentals):
    * word count in [50, 100000]; mean word length in [3, 10]; symbol
    * (`#`/`...`)-to-word ratio < 0.1; > 80% of words contain an
    * alphabetic character; at least 2 of the paper's 8 stop words
    * present. The paper's line-shape rules (bullet/ellipsis line
    * ratios) are dropped: the corpus is single-line, so they would be
    * vacuously true and hash-invisible.
    *
    * Scale shape: ONE narrow codegen'd projection per document — five
    * regexp passes and a word split, zero shuffles, zero joins; the
    * sort is the gate's determinism tail, not the operator. */
  def txGopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRules(Tables.documents(spark, dir))

  private[operators] def gopherRules(docs: DataFrame): DataFrame = {
    val nWords = size(Portable.words(col("text"))).cast("double")
    val mwl = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
    val sym = (regexp_count(col("text"), lit("#")) +
      regexp_count(col("text"), lit("\\.\\.\\."))).cast("double") / nWords
    // words-containing-a-letter counted by REGEX, not a higher-order
    // filter() lambda: HOFs are interpreted and break whole-stage
    // codegen at this projection (seen in the plan golden); the pattern
    // stays codegen'd. Each match consumes its own leading delimiter
    // ((?:^| )), so adjacent qualifying words cannot overlap-skip.
    val alphaFrac = regexp_count(col("text"), lit("(?:^| )[^ ]*[A-Za-z][^ ]*"))
      .cast("double") / nWords
    val stopHits = GopherStopWords
      .map(w => when(col("text").rlike(s"\\b$w\\b"), 1).otherwise(0))
      .reduce(_ + _)
    val wcOk = nWords >= 50.0 && nWords <= 100000.0
    val mwlOk = mwl >= 3.0 && mwl <= 10.0
    val symOk = sym < 0.1
    val alphaOk = alphaFrac > 0.8
    val stopOk = stopHits >= 2
    docs
      .select(col("doc_id"), wcOk.as("wc_ok"), mwlOk.as("mwl_ok"),
        symOk.as("sym_ok"), alphaOk.as("alpha_ok"), stopOk.as("stop_ok"),
        (wcOk && mwlOk && symOk && alphaOk && stopOk).as("pass"))
      .orderBy(col("doc_id"))
  }

  /** The paper's stop-word list (appendix A1.1): "the, be, to, of, and,
    * that, have, with". */
  private[operators] val GopherStopWords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  val txGopherRulesSql: String = {
    val stopHits = GopherStopWords
      .map(w => s"CASE WHEN regexp_matches(text, '\\b$w\\b') THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    s"""
    WITH c AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
             CAST(length(replace(text, ' ', '')) AS DOUBLE) AS wchars,
             CAST(len(regexp_extract_all(text, '#')) AS DOUBLE)
               + CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE) AS sym,
             CAST(len(regexp_extract_all(text, '(?:^| )[^ ]*[A-Za-z][^ ]*'))
               AS DOUBLE) AS alpha_words,
             $stopHits AS stop_hits
      FROM documents),
    r AS (
      SELECT doc_id,
             n_words >= 50.0 AND n_words <= 100000.0 AS wc_ok,
             wchars / n_words >= 3.0 AND wchars / n_words <= 10.0 AS mwl_ok,
             sym / n_words < 0.1 AS sym_ok,
             alpha_words / n_words > 0.8 AS alpha_ok,
             stop_hits >= 2 AS stop_ok
      FROM c)
    SELECT doc_id, wc_ok, mwl_ok, sym_ok, alpha_ok, stop_ok,
           wc_ok AND mwl_ok AND sym_ok AND alpha_ok AND stop_ok AS pass
    FROM r ORDER BY doc_id"""
  }

  /** Corpus vocabulary: the 50 most frequent word tokens with counts and
    * document frequency — the vocab/contamination scan of a training-data
    * pipeline. Partial-aggregated groupBy on the token, top-k via
    * TakeOrderedAndProject (never a full sort); ties broken by token. */
  def txVocabTopK(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Portable.words(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("tok"))
      .limit(50)

  val txVocabTopKSql: String = """
    SELECT tok, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n_occurrences DESC, tok
    LIMIT 50"""

  /** Deterministic stratified sampling — dataset curation's class
    * balancer. Membership is `hash(salt ++ id) mod 1000 < per-class
    * threshold`: no RNG and no seed state, so the sample is identical
    * across runs, partitionings, and engines (oracle-exact), and any row
    * can be re-tested for membership in O(1). Here: keep 50% of English
    * docs and 10% of everything else. */
  def txHashSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(
      Portable.hash60(concat(lit("sample:"), col("doc_id").cast("string"))), lit(1000L))
    val keepBelow = when(col("lang") === "en", lit(500L)).otherwise(lit(100L))
    Tables.documents(spark, dir)
      .filter(bucket < keepBelow)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val txHashSampleSql: String = s"""
    SELECT doc_id, lang
    FROM documents
    WHERE ((${Portable.hash60Sql("('sample:' || CAST(doc_id AS VARCHAR))")} % 1000) + 1000) % 1000
          < CASE WHEN lang = 'en' THEN 500 ELSE 100 END
    ORDER BY doc_id"""

  /** Document fingerprinting: md5 of the whitespace-normalized lowercase
    * text, plus the portable 60-bit integer fingerprint (the primitive the
    * MinHash/SimHash dedup family builds on). */
  /** Whitespace-normalized lowercase body — THE canonical content
    * identity every content-keyed operator must share (fingerprinting,
    * split assignment): a drift between two private copies would
    * silently break the exact-dup-lands-in-same-split guarantee. */
  def normText(c: Column): Column =
    regexp_replace(lower(c), lit("\\s+"), lit(" "))

  def normTextSql(x: String): String =
    s"regexp_replace(lower($x), '\\s+', ' ', 'g')"

  def txFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val norm = normText(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(norm).as("fp_md5"),
        Portable.hash60(norm).as("fp_int60"))
      .orderBy(col("doc_id"))
  }

  val txFingerprintSql: String = s"""
    WITH n AS (
      SELECT doc_id, ${normTextSql("text")} AS norm
      FROM documents)
    SELECT doc_id, md5(norm) AS fp_md5, ${Portable.hash60Sql("norm")} AS fp_int60
    FROM n ORDER BY doc_id"""

  /** PII patterns redacted by [[redact]] — RE2-compatible (the syntax
    * subset Java regex and DuckDB share), applied longest-first so an
    * email is not half-eaten by a shorter pattern.
    *
    * DELIBERATELY a Seq with DUPLICATE tokens ("[PHONE]" appears twice,
    * for the international and the dashed-US forms): every consumer
    * must FOLD over it in order. Never convert it to a Map (the
    * `langProfiles.toMap` idiom elsewhere in this file) — that would
    * silently drop one of the phone patterns. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[EMAIL]" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "[PHONE]" -> "\\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3}[ -]?[0-9]{2,4}",
    "[IP]"    -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    // r11: SSN and the dashed US phone form — disjoint from each other
    // (middle group 2 vs 3 digits) and from the forms above; the
    // `tx_pii_audit` gate plants both plus negative controls
    "[SSN]"   -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "[PHONE]" -> "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b")

  /** PII redaction — training-data hygiene's scrubber: replace every
    * email / phone / IP occurrence with a typed placeholder token, at
    * scan speed (chained codegen'd `regexp_replace`, zero shuffle). At
    * 100 TB this runs fused into the same projection as the rest of the
    * text pipeline — no extra pass. */
  def redact(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (token, re)) =>
      regexp_replace(acc, lit(re), lit(token))
    }

  def redactSql(x: String): String =
    piiPatterns.foldLeft(x) { case (acc, (token, re)) =>
      s"regexp_replace($acc, '$re', '$token', 'g')"
    }

  /** Gated query: the corpus carries no real PII (synthetic), so each
    * doc gets a deterministic contact line appended — the redaction then
    * has real work to do and the oracle mirrors injection + scrub. */
  def txRedact(spark: SparkSession, dir: String): DataFrame = {
    val contact = concat(col("text"),
      lit(" contact: user"), col("doc_id").cast("string"),
      lit("@example.com or +1 555 010 2368 at 10.0."),
      pmod(col("doc_id"), lit(250L)).cast("string"), lit(".25"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), redact(contact).as("clean"))
      .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
        (col("clean").contains("[EMAIL]") && col("clean").contains("[PHONE]") &&
          col("clean").contains("[IP]") && !col("clean").contains("@") &&
          !col("clean").contains("example.com")).as("fully_redacted"))
      .orderBy(col("doc_id"))
  }

  /** Non-distinct word n-gram list — [[Portable.shingles]] WITHOUT the
    * dedup: repetition signals need multiplicities (a doc that repeats
    * one 2-gram fifty times has one distinct shingle but a 1.0
    * repetition fraction). */
  private def ngramList(c: Column, n: Int): Column = {
    val w = Portable.words(c)
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
  }

  /** Relational reference form of the repetition stats for one n:
    * explode grams, groupBy (doc_id, gram), groupBy doc_id. Kept (and
    * fuzz-compared in PropertySpec) as the executable spec for the
    * per-row [[graft.functions.RepetitionStats]] kernel the gated query
    * actually runs — the exploded form shuffles ~2× the corpus token
    * count per n, the kernel shuffles nothing. */
  private[operators] def repStats(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), explode(ngramList(col("text"), n)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        (max(col("cnt")).cast("double") / sum(col("cnt"))).as(s"top${n}_frac"),
        (coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).cast("double")
          / sum(col("cnt"))).as(s"dup${n}_frac"))

  /** Repetition quality signals (the Gopher rules family — Rae et al.
    * 2021 §A1.1 filter repetitious documents by exactly these
    * fractions): a document dominated by one repeated n-gram, or with
    * most of its n-gram mass duplicated, is boilerplate/spam and gets
    * filtered before training. Computed by the codegen'd per-row
    * [[graft.functions.RepetitionStats]] kernel — a narrow projection
    * with no explode and no shuffle; docs too short for n-grams get
    * fractions 0.0 from the kernel, matching the relational reference's
    * left-join + coalesce. */
  def txRepetition(spark: SparkSession, dir: String): DataFrame = {
    val r = graft.functions.RepetitionStats.repetitionStats(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), r.as("r"))
      .select(col("doc_id"),
        element_at(col("r"), 1).as("top2_frac"),
        element_at(col("r"), 2).as("dup2_frac"),
        element_at(col("r"), 3).as("top3_frac"),
        element_at(col("r"), 4).as("dup3_frac"))
      .orderBy(col("doc_id"))
  }

  private def repStatsSql(n: Int): String = {
    val gram = (0 until n).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
    s"""g$n AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws) - ${n - 2}), i -> $gram)) AS g
      FROM w WHERE len(ws) >= $n),
    c$n AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g$n GROUP BY doc_id, g),
    s$n AS (
      SELECT doc_id,
             CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top${n}_frac,
             CAST(COALESCE(SUM(cnt) FILTER (WHERE cnt > 1), 0) AS DOUBLE)
               / SUM(cnt) AS dup${n}_frac
      FROM c$n GROUP BY doc_id)"""
  }

  val txRepetitionSql: String = s"""
    WITH w AS (SELECT doc_id, ${Portable.wordsSql("text")} AS ws FROM documents),
    ${repStatsSql(2)},
    ${repStatsSql(3)}
    SELECT d.doc_id,
           COALESCE(top2_frac, 0.0) AS top2_frac,
           COALESCE(dup2_frac, 0.0) AS dup2_frac,
           COALESCE(top3_frac, 0.0) AS top3_frac,
           COALESCE(dup3_frac, 0.0) AS dup3_frac
    FROM documents d
    LEFT JOIN s2 USING (doc_id)
    LEFT JOIN s3 USING (doc_id)
    ORDER BY d.doc_id"""

  /** Deterministic train/val/test assignment, hashed on the CONTENT
    * fingerprint rather than the doc id: exact duplicates (and any doc
    * re-ingested under a new id) land in the same split, so dedup
    * misses cannot leak training text into eval. 80/10/10 by hash
    * bucket; membership is re-derivable per row in O(1) with no RNG,
    * seed state, or global sort — the same property as
    * [[txHashSample]]. */
  def txSplitAssign(spark: SparkSession, dir: String): DataFrame = {
    val norm = normText(col("text"))
    val bucket = pmod(
      Portable.hash60(concat(lit("split:"), md5(norm))), lit(100L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), bucket.as("bucket"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  val txSplitAssignSql: String = s"""
    WITH n AS (
      SELECT doc_id,
             md5(${normTextSql("text")}) AS fp
      FROM documents),
    b AS (
      SELECT doc_id,
             ((${Portable.hash60Sql("('split:' || fp)")} % 100) + 100) % 100 AS bucket
      FROM n)
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b ORDER BY doc_id"""

  /** Stratified rebalancing sample: equalize language strata down to the
    * smallest stratum. Two passes — (1) per-stratum counts (5-row
    * aggregate), (2) per-stratum keep-permille = ⌊min_count·1000/count⌋
    * broadcast-joined back onto the corpus and applied as a
    * deterministic content-independent hash filter. This is the domain
    * mixing op of a training-data pipeline: rates are DERIVED FROM THE
    * DATA (unlike [[txHashSample]]'s fixed config rates), and the plan
    * is one tiny aggregate + one broadcast join + a narrow filter — no
    * corpus shuffle, no RNG state, re-runnable to the same sample. */
  def txStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    // single-partition window is fine HERE: it runs over the per-stratum
    // aggregate (strata-count rows), never the corpus. The key is
    // constant but NON-FOLDABLE (Portable.onePartition): lit(1) gets
    // stripped by Spark 4's EliminateWindowPartitions, and the empty
    // spec makes WindowExec emit a "No Partition Defined" warning per
    // run, burying real warnings in the bench tail.
    val target = min(col("n"))
      .over(org.apache.spark.sql.expressions.Window
        .partitionBy(Portable.onePartition(col("n"))))
    val rates = counts
      .select(col("lang"),
        floor(target * 1000.0 / col("n")).cast("long").as("permille"))
    val bucket = pmod(
      Portable.hash60(concat(lit("strat:"), col("doc_id").cast("string"))), lit(1000L))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(bucket < col("permille"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val txStratifiedSampleSql: String = s"""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    t AS (SELECT MIN(n) AS target FROM c),
    r AS (SELECT lang, CAST(floor(target * 1000.0 / n) AS BIGINT) AS permille
          FROM c, t)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN r USING (lang)
    WHERE ((${Portable.hash60Sql("('strat:' || CAST(doc_id AS VARCHAR))")} % 1000) + 1000) % 1000
          < permille
    ORDER BY d.doc_id"""

  /** Words with corpus count below this are "rare" — an absolute floor
    * (hapax/dis-legomena style), deliberately not relative to corpus
    * size: a relative threshold would need a global scalar joined onto
    * every row, and absolute rarity is what n-gram-LM-adjacent quality
    * filters actually use. */
  val RARE_MIN_COUNT = 3L

  /** Corpus-frequency quality signals per doc: average corpus count of
    * the doc's tokens (boilerplate docs score high — their words are
    * everywhere) and the fraction of token occurrences that are corpus-
    * rare (garbage/OCR noise scores high). The LM-free stand-in for a
    * CCNet-style perplexity filter, and deliberately transcendental-free:
    * all aggregation happens on exact integers (counts of counts), with
    * ONE double division at the end — a float sum over words would be
    * accumulation-order-dependent and break the bit-exact oracle.
    *
    * Scale shape: vocab count (shuffle by word, map-side combine),
    * occurrence⋈vocab equi-join (AQE-decided; a capped top-K vocab
    * broadcast is the 100 TB variant), per-doc integer aggregate. */
  def txWordFreq(spark: SparkSession, dir: String): DataFrame =
    wordFreq(Tables.documents(spark, dir))

  def wordFreq(docs: DataFrame): DataFrame = {
    // persisted: the scan+explode pass feeds both the vocab aggregate
    // and the join probe side
    val words = graft.Caches.persist(docs
      .select(col("doc_id"), explode(Portable.words(col("text"))).as("w")))
    val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    words.join(vocab, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("sum_cnt"), count(lit(1)).as("n_words"),
        sum(when(col("cnt") < RARE_MIN_COUNT, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"),
        (col("sum_cnt").cast("double") / col("n_words")).as("avg_word_count"),
        (col("n_rare").cast("double") / col("n_words")).as("rare_frac"))
      .orderBy(col("doc_id"))
  }

  val txWordFreqSql: String = s"""
    WITH words AS (
      SELECT doc_id, unnest(${Portable.wordsSql("text")}) AS w FROM documents),
    vocab AS (SELECT w, COUNT(*) AS cnt FROM words GROUP BY w),
    perdoc AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS sum_cnt,
             COUNT(*) AS n_words,
             CAST(COALESCE(SUM(CASE WHEN cnt < $RARE_MIN_COUNT THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_rare
      FROM words JOIN vocab USING (w) GROUP BY doc_id)
    SELECT doc_id,
           CAST(sum_cnt AS DOUBLE) / n_words AS avg_word_count,
           CAST(n_rare AS DOUBLE) / n_words AS rare_frac
    FROM perdoc ORDER BY doc_id"""

  /** Unigram surprisal quality score — the information-theoretic twin
    * of [[wordFreq]]: each word's surprisal is −log₂ p(word) under the
    * corpus unigram LM, quantized to WHOLE BITS as
    * `floor(log₂(total/cnt)) = length(bin(total div cnt)) − 1` — an
    * integer bit count computed from the binary rendering, so the
    * entire score pipeline is transcendental-free and hash-exact (the
    * same reason BM25's gated output is rank-only: libm `log` has no
    * cross-engine bit contract, integer bit-length does). Per doc:
    * total surprisal bits and the mean in millibits (integer div).
    * High mean = rare-word-heavy (OCR noise, gibberish); low =
    * boilerplate. The whole-bit floor loses < 1 bit/word of resolution
    * — irrelevant for a quality FILTER whose thresholds are themselves
    * heuristic, and what it buys is a score two engines agree on to
    * the last digit.
    *
    * Scale shape: identical to [[wordFreq]] (vocab shuffle + equi-join
    * + per-doc integer aggregate); the corpus total is one driver
    * scalar. */
  def surprisal(docs: DataFrame): DataFrame = {
    val words = graft.Caches.persist(docs
      .select(col("doc_id"), explode(Portable.words(col("text"))).as("w")))
    val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val total = words.count()
    val bits = length(bin(expr(s"${total}L div cnt"))) - 1
    words.join(vocab.withColumn("bits", bits.cast("long")), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("bits")).as("sum_bits"))
      .select(col("doc_id"), col("n_words"), col("sum_bits"),
        expr("sum_bits * 1000L div n_words").as("mean_millibits"))
      .orderBy(col("doc_id"))
  }

  /** Gated query: surprisal scores over the documents table. */
  def txSurprisal(spark: SparkSession, dir: String): DataFrame =
    surprisal(Tables.documents(spark, dir))

  val txSurprisalSql: String = s"""
    WITH words AS (
      SELECT doc_id, unnest(${Portable.wordsSql("text")}) AS w FROM documents),
    tot AS (SELECT COUNT(*) AS total FROM words),
    vocab AS (
      SELECT w, CAST(length(bin(total // COUNT(*))) - 1 AS BIGINT) AS bits
      FROM words, tot GROUP BY w, total),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_words,
             CAST(SUM(bits) AS BIGINT) AS sum_bits
      FROM words JOIN vocab USING (w) GROUP BY doc_id)
    SELECT doc_id, n_words, sum_bits,
           sum_bits * 1000 // n_words AS mean_millibits
    FROM perdoc ORDER BY doc_id"""

  /** Bigram-LM surprisal — the conditional upgrade of [[surprisal]] and
    * the shape of a CCNet-style perplexity filter (Wenzek et al. 2020)
    * without the external model: each transition's surprisal is
    * −log₂ p(w₂|w₁) under the corpus's own bigram LM, p(w₂|w₁) =
    * c(w₁w₂)/c(w₁·), quantized to whole bits by the same integer
    * bit-length trick (`length(bin(c₁ div c₁₂)) − 1` — transcendental-
    * free, hash-exact; see [[surprisal]] for why). The context count is
    * the number of bigrams STARTING with w₁ (not the raw unigram count),
    * so the model is self-consistent — Σ_w₂ p(w₂|w₁) = 1 exactly — and
    * c₁ ≥ c₁₂ always, so bits ≥ 0. A doc that repeats the corpus's
    * common transitions scores low (boilerplate, templated spam); a doc
    * whose transitions are each individually common words in rare ORDER
    * scores high — the signal unigram surprisal is blind to, and the
    * reason perplexity filters beat word-frequency filters on
    * shuffled/garbled text. Docs under 2 words have no transition and
    * are absent, as from any LM scorer.
    *
    * Scale shape: identical family to [[wordFreq]]/[[surprisal]] — the
    * bigram relation is linear in tokens, both count relations are
    * map-side-combined groupBys keyed by (bi)gram, the two probability
    * joins are AQE-decided equi-joins on the gram key (a capped top-K
    * LM broadcast is the 100 TB variant, exactly as for the unigram
    * vocab), and the per-doc tail is one integer aggregate. No window,
    * no position self-join — bigrams come straight off the token array
    * ([[Portable.ngrams]]). */
  def bigramSurprisal(docs: DataFrame): DataFrame =
    bigramScores(docs).orderBy(col("doc_id"))

  /** The unordered scores relation — composed operators (semantic
    * curation's perplexity gate) filter on it mid-plan, where a sort
    * would be a wasted Exchange. */
  def bigramScores(docs: DataFrame): DataFrame = {
    // persisted: feeds the bigram counts, the context counts, and the
    // probe side of both joins. Spread first ([[Tables.spread]]): the
    // gram explode + string split is the CPU-dense pass, and inheriting
    // one-file scan partitioning serialized it onto one core.
    val grams = graft.Caches.persist(Tables.spread(docs, "doc_id")
      .select(col("doc_id"), explode(Portable.ngrams(col("text"), 2)).as("g")))
    val big = grams.groupBy(col("g")).agg(count(lit(1)).as("cnt2"))
    val ctx = grams
      .groupBy(element_at(split(col("g"), " "), 1).as("w1"))
      .agg(count(lit(1)).as("cnt1"))
    bigramScoresFrom(grams, big, ctx)
  }

  /** [[bigramScores]] from PREBUILT gram/LM relations — the artifact
    * trainer ([[trainPersistCcnet]]) scores with the exact relations it
    * persists, so the gram explode and both count aggregations run
    * once, not twice. */
  private def bigramScoresFrom(grams: DataFrame, big: DataFrame,
                               ctx: DataFrame): DataFrame =
    grams.join(big, "g")
      .join(ctx, element_at(split(col("g"), " "), 1) === col("w1"))
      .withColumn("bits", (length(bin(expr("cnt1 div cnt2"))) - 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sum_bits"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_bits"),
        expr("sum_bits * 1000L div n_bigrams").as("mean_millibits"))

  /** The bigram-score CTE chain from a named (doc_id, text) relation to
    * `perdoc(doc_id, n_bigrams, sum_bits)` — for composed oracles. */
  def bigramScoreCtesOf(src: String): String = s"""
    grams AS (
      SELECT doc_id, unnest(${Portable.ngramsSql("text", 2)}) AS g
      FROM $src),
    big AS (SELECT g, COUNT(*) AS cnt2 FROM grams GROUP BY g),
    ctx AS (
      SELECT string_split(g, ' ')[1] AS w1, COUNT(*) AS cnt1
      FROM grams GROUP BY 1),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(CAST(length(bin(cnt1 // cnt2)) - 1 AS BIGINT)) AS BIGINT)
               AS sum_bits
      FROM grams
      JOIN big USING (g)
      JOIN ctx ON string_split(grams.g, ' ')[1] = ctx.w1
      GROUP BY doc_id)"""

  /** Gated query: bigram-LM surprisal over the documents table. */
  def txBigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    bigramSurprisal(Tables.documents(spark, dir))

  // built from the same CTE builder the composed dd_curate_semantic
  // oracle uses, so the two can never drift
  val txBigramSurprisalSql: String = s"""
    WITH ${bigramScoreCtesOf("documents")}
    SELECT doc_id, n_bigrams, sum_bits,
           sum_bits * 1000 // n_bigrams AS mean_millibits
    FROM perdoc ORDER BY doc_id"""

  /** CCNet-style perplexity BUCKETS (Wenzek et al. 2020, §4.3): per
    * language, split the corpus into head/middle/tail thirds by LM
    * score — CCNet trains on `head`, samples `middle`, drops `tail`;
    * the bucket label is the standard curation handle downstream mixes
    * key on. The LM is [[bigramScores]]' self-trained bigram surprisal
    * (whole-bit integer quantized, hash-exact — see there), matching
    * CCNet's "lower perplexity = cleaner" ordering.
    *
    * Cut semantics are CCNet's actual THRESHOLD form, not NTILE: the
    * per-lang cut points t₁/t₂ are the smallest scores whose cumulative
    * doc count reaches ⌈n/3⌉ / ⌈2n/3⌉, and every doc compares its score
    * against them — so equal scores always land in the same bucket
    * (NTILE would split ties by arbitrary row order, which no engine
    * pair reproduces deterministically), and the thirds are exact up to
    * tie mass. All-integer arithmetic end to end.
    *
    * Scale shape: the quantized score makes the per-(lang, score)
    * HISTOGRAM the only shuffled relation — bounded by |langs|·|distinct
    * millibit scores| (thousands of rows at any corpus size), map-side
    * combined. The cumulative window runs over that histogram
    * partitioned by lang — never over the corpus — and the thresholds
    * broadcast back. Same pattern as [[lengthPercentile]]: rank
    * semantics at 100 TB without a corpus-wide sort. */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    val scored = bigramScores(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("mean_millibits"))
    scored.join(broadcast(ccnetThresholds(scored)), "lang")
      .withColumn("bucket", ccnetBucketOf)
      .select(col("doc_id"), col("lang"), col("mean_millibits"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Per-lang tercile cut points (lang, t1, t2) from a scored
    * (lang, mean_millibits) relation — the histogram form (see
    * [[ccnetBuckets]]); shared by the in-query gate and the persisted
    * artifact trainer so the two can never drift. */
  private def ccnetThresholds(scored: DataFrame): DataFrame = {
    val hist = scored.groupBy(col("lang"), col("mean_millibits"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(
        Window.partitionBy(col("lang")).orderBy(col("mean_millibits"))))
    val tot = hist.groupBy(col("lang")).agg(sum(col("cnt")).as("n"))
    cum.join(tot, "lang")
      .groupBy(col("lang"))
      .agg(
        min(when(col("cum") >= expr("(n + 2) div 3"),
          col("mean_millibits"))).as("t1"),
        min(when(col("cum") >= expr("(2 * n + 2) div 3"),
          col("mean_millibits"))).as("t2"))
  }

  /** The bucket label from a row carrying mean_millibits, t1, t2. */
  private def ccnetBucketOf: Column =
    when(col("mean_millibits") <= col("t1"), lit("head"))
      .when(col("mean_millibits") <= col("t2"), lit("middle"))
      .otherwise(lit("tail"))

  /** LM row count above which [[ccnetServe]] stops hinting a broadcast
    * and lets AQE pick the join strategy — ~2M short strings is the
    * comfortable ceiling for an executor-resident build side; beyond
    * it a hard `broadcast()` hint OOMs executors with no fallback. */
  val CcnetBroadcastMaxRows: Long = 2L * 1000 * 1000

  /** Default vocabulary bound for the persisted CCNet LM — bigram TYPES
    * kept. Far above any gate corpus's whole vocabulary (so the cap is
    * TRANSPARENT there and the gate stays hash-exact against the
    * uncapped oracle) while bounding the 100 TB artifact — and set
    * EQUAL to [[CcnetBroadcastMaxRows]] on purpose, so a
    * default-trained artifact always qualifies for the broadcast-hash
    * serve path. Raising the cap past the broadcast ceiling is
    * supported (the serving joins fall back to AQE-decided strategies)
    * but must go through a sized caller ([[openCcnetLm]] /
    * [[ccnetServeFrom]]) rather than [[ccnetServe]]'s broadcast
    * default. */
  val DefaultCcnetTopK: Long = CcnetBroadcastMaxRows

  /** Exact top-K types of a `(g, cnt2)` count relation by
    * (cnt2 desc, hash-of-g, g) — the LM vocabulary cap, computed
    * WITHOUT a global sort or a driver-side collect of the relation:
    *
    *   1. count-of-counts histogram (bounded by the number of distinct
    *      frequencies — O(√tokens) under any Zipf-ish corpus, a few
    *      thousand rows at 100 TB), running-summed descending on a
    *      deliberately single-partition window (tiny frame);
    *   2. the one (floor, kept_above) scalar row collected — the count
    *      class where the running type total first reaches K. No class
    *      reaches K ⇒ the cap exceeds the vocabulary ⇒ the input is
    *      returned unchanged (the transparent case the gate proves);
    *   3. everything strictly above the floor count survives; the floor
    *      TIE CLASS (can be the huge cnt=1 class) is broken
    *      deterministically by [[Pack.globalShuffle]]'s two-phase rank
    *      over (hash, g) — no single-partition window over the class.
    *
    * Deterministic: same counts, same K ⇒ byte-identical LM on any
    * cluster. */
  private[operators] def capTopK(big: DataFrame, k: Long): DataFrame = {
    require(k > 0, s"LM cap must be positive, got $k")
    val hist = big.groupBy(col("cnt2")).agg(count(lit(1)).as("types"))
    val cum = hist.withColumn("cum",
      sum(col("types")).over(
        Window.partitionBy(Portable.onePartition(col("cnt2")))
          .orderBy(col("cnt2").desc)
          .rowsBetween(Window.unboundedPreceding, 0)))
    val floorRow = cum.filter(col("cum") >= k)
      .orderBy(col("cnt2").desc).limit(1)
      .select(col("cnt2"), (col("cum") - col("types")).as("kept_above"))
      .collect() // ≤ 1 row — a bounded driver scalar, not corpus data
    if (floorRow.isEmpty) return big
    val floor = floorRow.head.getLong(0)
    val fromTie = k - floorRow.head.getLong(1)
    val above = big.filter(col("cnt2") > floor).select(col("g"), col("cnt2"))
    val tie = Pack.globalShuffle(
        big.filter(col("cnt2") === floor).select(col("g")), "g", "g")
      .filter(col("position") < fromTie)
      .select(col("g"), lit(floor).as("cnt2"))
    above.unionByName(tie)
  }

  /** Train the CCNet artifact OFFLINE and persist it: the bigram-LM
    * count relations (`big`: per-bigram count, CAPPED to the `topK`
    * most frequent bigram types via [[capTopK]]; `ctx`: per-first-word
    * context count DERIVED from the capped bigrams, so the model stays
    * self-consistent — Σ_w₂ p(w₂|w₁) = 1 over the KEPT transitions and
    * c₁ ≥ c₁₂ always) plus the per-lang bucket thresholds — everything
    * [[ccnetServe]] needs to score and bucket NEW text without the
    * training corpus. The cap bounds the artifact at any corpus size
    * (the 100 TB posture [[wordFreq]]'s scaladoc describes for the
    * unigram vocab); with `topK` at or above the corpus's whole bigram
    * vocabulary it is exactly transparent — the gate trains with the
    * default cap and stays hash-exact against the uncapped oracle,
    * which is the proof of transparency. Thresholds are scored from
    * the SAME capped relations just persisted (one gram pass total),
    * so serve-time scores and train-time cut points can never drift.
    *
    * The trainer's three persisted intermediates are scoped to this
    * call and unpersisted on the way out — trainers must not leak
    * cache state into the caller's session ([[graft.Caches]] stays
    * untouched; a global releaseAll here would free FOREIGN caches). */
  def trainPersistCcnet(spark: SparkSession, dir: String,
                        lmDir: String,
                        topK: Long = DefaultCcnetTopK): Unit = {
    val docs = Tables.documents(spark, dir)
    trainPersistLm(docs,
      Tables.spread(docs, "doc_id")
        .select(col("doc_id"), explode(Portable.ngrams(col("text"), 2)).as("g")),
      lmDir, topK)(bigramScoresFrom)
  }

  /** The shared trainer protocol behind [[trainPersistCcnet]] and
    * [[trainPersistCcnetParagraphs]] — one gram pass total: cap the
    * bigram counts ([[capTopK]]), derive ctx from the CAPPED bigrams
    * (an LM-sized aggregate, cheaper than a second corpus pass;
    * uncapped it equals the gram-side count exactly — Σ cnt2 over
    * bigrams starting w1 IS that count, keeping Σ p(w₂|w₁) = 1 and
    * bits ≥ 0), persist the artifact, then cut thresholds from scores
    * computed against the EXACT relations just written (`score` is the
    * granularity-specific chain returning (doc_id, …, mean_millibits)).
    * Every cached intermediate is scoped to this call and unpersisted
    * on the way out — trainers must not leak cache state into the
    * caller's session ([[graft.Caches]] stays untouched; a global
    * releaseAll here would free FOREIGN caches). */
  private def trainPersistLm(docs: DataFrame, gramsRaw: DataFrame,
      lmDir: String, topK: Long)(
      score: (DataFrame, DataFrame, DataFrame) => DataFrame): Unit = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val grams = gramsRaw.persist(level)
    try {
      val big = capTopK(
        grams.groupBy(col("g")).agg(count(lit(1)).as("cnt2")), topK)
        .persist(level)
      try {
        val ctx = big
          .groupBy(element_at(split(col("g"), " "), 1).as("w1"))
          .agg(sum(col("cnt2")).as("cnt1"))
          .persist(level)
        try {
          big.write.mode("overwrite").parquet(s"$lmDir/big")
          ctx.write.mode("overwrite").parquet(s"$lmDir/ctx")
          val scored = score(grams, big, ctx)
            .join(docs.select(col("doc_id"), col("lang")), "doc_id")
            .select(col("doc_id"), col("lang"), col("mean_millibits"))
          ccnetThresholds(scored)
            .write.mode("overwrite").parquet(s"$lmDir/thresholds")
        } finally ctx.unpersist(true)
      } finally big.unpersist(true)
    } finally grams.unpersist(true)
  }

  /** The SERVING half: score and bucket a (doc_id, lang, text) relation
    * against a persisted CCNet artifact — stateless per row set, so it
    * runs unchanged on a stream's micro-batches (the
    * `stream_ccnet_score` gate) or any batch slice. Transitions absent
    * from the LM are skipped (inner join — the standard
    * unknown-transition policy; on the gate corpus the LM is trained on
    * the same table under a transparent cap, so none are). Docs under 2
    * words have no transition and are absent, as from the trainer.
    *
    * `broadcastLm` gates the LM-side join hint: true (small LM — the
    * capped default comfortably qualifies) pins a broadcast-hash join
    * with zero shuffle of the served docs; false (an LM trained with a
    * raised cap) leaves the strategy to AQE's equi-join sizing, which
    * is the safe default for a build side that no longer fits executor
    * memory. Callers serving from a persisted artifact should size this
    * from the artifact itself — [[ccnetServeFrom]] does. The thresholds
    * relation is |langs| rows and always broadcasts. */
  def ccnetServe(docs: DataFrame, big: DataFrame, ctx: DataFrame,
                 th: DataFrame, broadcastLm: Boolean = true): DataFrame = {
    def lmSide(lm: DataFrame): DataFrame = if (broadcastLm) broadcast(lm) else lm
    // spread the served batch: a replayed micro-batch arrives as one
    // file = one partition, which would serialize the gram explode and
    // the LM probe onto one core (see [[Tables.spread]])
    Tables.spread(docs, "doc_id")
      .select(col("doc_id"), col("lang"),
        explode(Portable.ngrams(col("text"), 2)).as("g"))
      .join(lmSide(big), "g")
      .join(lmSide(ctx), element_at(split(col("g"), " "), 1) === col("w1"))
      .withColumn("bits", (length(bin(expr("cnt1 div cnt2"))) - 1).cast("long"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sum_bits"))
      .withColumn("mean_millibits", expr("sum_bits * 1000L div n_bigrams"))
      .join(broadcast(th), "lang")
      .withColumn("bucket", ccnetBucketOf)
      .select(col("doc_id"), col("lang"), col("mean_millibits"), col("bucket"))
  }

  /** Open a persisted CCNet artifact ([[trainPersistCcnet]]'s layout)
    * and return its relations plus the broadcast decision, sized from
    * the artifact's actual row count (one LM-sized count job, run once
    * per artifact open — not per served batch). */
  def openCcnetLm(spark: SparkSession, lmDir: String)
      : (DataFrame, DataFrame, DataFrame, Boolean) = {
    val big = spark.read.schema("g STRING, cnt2 BIGINT").parquet(s"$lmDir/big")
    val ctx = spark.read.schema("w1 STRING, cnt1 BIGINT").parquet(s"$lmDir/ctx")
    val th = spark.read.schema("lang STRING, t1 BIGINT, t2 BIGINT")
      .parquet(s"$lmDir/thresholds")
    (big, ctx, th, big.count() <= CcnetBroadcastMaxRows)
  }

  /** Serve `docs` against the persisted artifact at `lmDir`, with the
    * broadcast decision made from the artifact size. */
  def ccnetServeFrom(spark: SparkSession, lmDir: String,
                     docs: DataFrame): DataFrame = {
    val (big, ctx, th, bcast) = openCcnetLm(spark, lmDir)
    ccnetServe(docs, big, ctx, th, broadcastLm = bcast)
  }

  /** Gated query: CCNet buckets over the documents table. Docs under 2
    * words have no LM score and are absent, as from any LM scorer. */
  def txCcnetBuckets(spark: SparkSession, dir: String): DataFrame =
    ccnetBuckets(Tables.documents(spark, dir))

  val txCcnetBucketsSql: String = s"""
    WITH ${bigramScoreCtesOf("documents")},
    scored AS (
      SELECT p.doc_id, d.lang,
             p.sum_bits * 1000 // p.n_bigrams AS mean_millibits
      FROM perdoc p JOIN documents d USING (doc_id)),
    hist AS (
      SELECT lang, mean_millibits, COUNT(*) AS cnt
      FROM scored GROUP BY lang, mean_millibits),
    cumh AS (
      SELECT lang, mean_millibits,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY mean_millibits) AS cum
      FROM hist),
    tot AS (SELECT lang, SUM(cnt) AS n FROM hist GROUP BY lang),
    th AS (
      SELECT lang,
             MIN(CASE WHEN cum >= (n + 2) // 3 THEN mean_millibits END) AS t1,
             MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN mean_millibits END) AS t2
      FROM cumh JOIN tot USING (lang) GROUP BY lang)
    SELECT s.doc_id, s.lang, s.mean_millibits,
           CASE WHEN s.mean_millibits <= th.t1 THEN 'head'
                WHEN s.mean_millibits <= th.t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s JOIN th USING (lang)
    ORDER BY s.doc_id"""

  /** Paragraph width (words) for the gated paragraph-granularity CCNet
    * query. The synthetic corpus carries no newline structure, so the
    * gate INDUCES paragraphs as disjoint word windows
    * ([[paragraphsByWindow]]); real crawl text splits on blank lines
    * via [[paragraphsByDelimiter]] — the bucket pipeline downstream of
    * the split is identical either way. */
  val ParaWords = 24

  /** Disjoint word-window "paragraphs" of a (doc_id, lang, text)
    * relation → (doc_id, lang, para_idx, ptext). One generator over a
    * codegen'd projection — zero shuffles, scan-speed at 100 TB, chunks
    * stay on their doc's partition (same shape as [[chunkOverlap]] with
    * stride = width). */
  def paragraphsByWindow(docs: DataFrame, width: Int): DataFrame = {
    require(width > 0, s"paragraph width must be positive, got $width")
    // NOT spread here, a MEASURED decision (r17): the window split
    // itself is cheap, and an unconditional exchange cost the small
    // consumers more than it bought (tx_paragraph_dedup 0.46→0.83 s,
    // tx_ccnet_paragraphs 2.71→3.02 s full-suite). The LM-heavy
    // consumers spread their INPUT at the call site instead (the
    // paragraph trainer and the per-batch serve below).
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), Portable.words(col("text")).as("words"))
      .select(col("doc_id"), col("lang"), col("words"),
        posexplode(sequence(lit(1), greatest(size(col("words")), lit(1)),
          lit(width))).as(Seq("para_idx", "para_start")))
      .select(col("doc_id"), col("lang"),
        col("para_idx").cast("long").as("para_idx"),
        concat_ws(" ", slice(col("words"), col("para_start"), lit(width)))
          .as("ptext"))
  }

  /** Blank-line paragraph split — Wenzek et al.'s actual delimiter —
    * for corpora whose text carries newline structure. */
  def paragraphsByDelimiter(docs: DataFrame,
                            delim: String = "\n{2,}"): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        posexplode(split(col("text"), delim)).as(Seq("para_idx", "ptext")))
      .select(col("doc_id"), col("lang"),
        col("para_idx").cast("long").as("para_idx"), col("ptext"))

  /** CCNet at PARAGRAPH granularity — the fidelity upgrade of
    * [[ccnetBuckets]] to what Wenzek et al. 2020 actually publish
    * (§4.3): the LM scores each PARAGRAPH, and a document is bucketed
    * by the MEAN of its paragraphs' perplexities — so one garbage
    * paragraph inside an otherwise-clean long document drags the doc
    * toward `tail` proportionally, where whole-doc scoring dilutes it
    * into the doc's full token mass. Pipeline: paragraph-level bigram
    * LM (transitions never cross a paragraph boundary, matching the
    * paragraph-wise scoring), per-paragraph integer millibits (same
    * whole-bit quantization as [[bigramScores]] — see there for why),
    * per-doc integer mean of paragraph means, then the SAME
    * [[ccnetThresholds]] histogram cut as the doc-level form — the two
    * gates share the threshold operator by construction, per the
    * shared-cut requirement. Paragraphs under 2 words have no
    * transition and are absent; docs whose every paragraph drops are
    * absent, as from any LM scorer.
    *
    * Scale shape: identical family to [[ccnetBuckets]] — gram relation
    * linear in tokens, LM counts map-side combined, AQE-decided
    * equi-joins, and the threshold cut runs on the per-(lang, score)
    * HISTOGRAM, never a corpus sort. The extra paragraph key widens the
    * per-para aggregate's grouping only; no new shuffle class. */
  def ccnetParagraphBuckets(docs: DataFrame, paras: DataFrame): DataFrame = {
    // persisted: the gram relation feeds both LM counts and the probe
    val grams = graft.Caches.persist(paragraphGrams(paras))
    val big = grams.groupBy(col("g")).agg(count(lit(1)).as("cnt2"))
    val ctx = grams
      .groupBy(element_at(split(col("g"), " "), 1).as("w1"))
      .agg(count(lit(1)).as("cnt1"))
    val scored = ccnetParagraphScores(grams, big, ctx, broadcastLm = false)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_paras"), col("mean_millibits"))
    scored.join(broadcast(ccnetThresholds(scored)), "lang")
      .withColumn("bucket", ccnetBucketOf)
      .select(col("doc_id"), col("lang"), col("n_paras"),
        col("mean_millibits"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** The paragraph gram relation: one row per bigram occurrence, keyed
    * by (doc_id, para_idx) — transitions never cross a boundary. */
  private def paragraphGrams(paras: DataFrame): DataFrame =
    paras.select(col("doc_id"), col("para_idx"),
      explode(Portable.ngrams(col("ptext"), 2)).as("g"))

  /** Per-doc paragraph-mean LM scores from a paragraph gram relation
    * and the two LM count relations — the scoring chain shared by the
    * in-query gate (in-corpus LM, AQE joins) and the artifact serving
    * path (persisted LM, broadcast-hinted when it fits). Returns
    * (doc_id, n_paras, mean_millibits) where n_paras counts SCORED
    * paragraphs (≥ 1 known transition). */
  private def ccnetParagraphScores(grams: DataFrame, big: DataFrame,
      ctx: DataFrame, broadcastLm: Boolean): DataFrame = {
    def lmSide(lm: DataFrame): DataFrame = if (broadcastLm) broadcast(lm) else lm
    grams.join(lmSide(big), "g")
      .join(lmSide(ctx), element_at(split(col("g"), " "), 1) === col("w1"))
      .withColumn("bits", (length(bin(expr("cnt1 div cnt2"))) - 1).cast("long"))
      .groupBy(col("doc_id"), col("para_idx"))
      .agg(count(lit(1)).as("nb"), sum(col("bits")).as("sb"))
      .select(col("doc_id"), expr("sb * 1000L div nb").as("para_millibits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"), sum(col("para_millibits")).as("s"))
      .select(col("doc_id"), col("n_paras"),
        expr("s div n_paras").as("mean_millibits"))
  }

  /** Train the PARAGRAPH-granularity CCNet artifact offline — the
    * paragraph-level twin of [[trainPersistCcnet]] (same layout: capped
    * `big`, derived `ctx`, per-lang `thresholds`), with the LM counted
    * over paragraph-internal transitions and the thresholds cut over
    * per-doc paragraph-MEAN scores, so [[ccnetParagraphServe]] buckets
    * new text exactly where the in-query `tx_ccnet_paragraphs` does. */
  def trainPersistCcnetParagraphs(spark: SparkSession, dir: String,
      lmDir: String, topK: Long = DefaultCcnetTopK): Unit = {
    val docs = Tables.documents(spark, dir)
    trainPersistLm(docs,
      paragraphGrams(paragraphsByWindow(
        Tables.spread(docs, "doc_id"), ParaWords)), lmDir, topK)(
      (g, b, c) => ccnetParagraphScores(g, b, c, broadcastLm = false))
  }

  /** Serve paragraph-granularity CCNet buckets for a (doc_id, lang,
    * text) relation against a persisted paragraph artifact — stateless
    * per row set (each doc arrives whole, its paragraphs split
    * in-batch), so it runs unchanged per micro-batch. Same
    * unknown-transition and short-paragraph semantics as the trainer. */
  def ccnetParagraphServe(docs: DataFrame, big: DataFrame, ctx: DataFrame,
      th: DataFrame, broadcastLm: Boolean = true): DataFrame = {
    // spread the served batch (one replay file = one partition would
    // serialize the paragraph split + LM probe; see Tables.spread)
    val grams = paragraphGrams(paragraphsByWindow(
      Tables.spread(docs, "doc_id"), ParaWords))
    ccnetParagraphScores(grams, big, ctx, broadcastLm)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .join(broadcast(th), "lang")
      .withColumn("bucket", ccnetBucketOf)
      .select(col("doc_id"), col("lang"), col("n_paras"),
        col("mean_millibits"), col("bucket"))
  }

  /** Gated query: paragraph-granularity CCNet buckets over the
    * documents table, paragraphs induced as [[ParaWords]]-word windows. */
  def txCcnetParagraphs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    ccnetParagraphBuckets(docs, paragraphsByWindow(docs, ParaWords))
  }

  /** EXACT PARAGRAPH DEDUP — the Dolma-style middle granularity between
    * whole-document exact dedup (misses boilerplate shared across
    * otherwise-distinct pages) and span/substring dedup (character
    * windows, no structural unit): every paragraph occurring more than
    * once ACROSS THE CORPUS survives only at its first occurrence
    * (smallest (doc_id, para_idx)); each document is reassembled from
    * its surviving paragraphs in order. Docs whose every paragraph was
    * someone else's duplicate vanish, as from any dedup.
    *
    * Keep-first is computed as a min-STRUCT aggregate on the paragraph
    * digest — (h) → min(doc_id, para_idx) — NOT a row_number window:
    * the aggregate is map-side combined and shuffles one candidate row
    * per distinct paragraph, where the window form sorts every
    * occurrence group. The reassembly collects per-doc surviving
    * paragraphs (bounded by the doc's own paragraph count — a per-doc
    * list, never a corpus list) and rejoins them in para_idx order.
    * The digest is [[Portable.hash60]] over the paragraph text —
    * dedup-grade, same contract as the exact-dedup family. */
  def paragraphDedup(paras: DataFrame): DataFrame = {
    val hp = paras.select(col("doc_id"), col("para_idx"), col("ptext"),
      Portable.hash60(col("ptext")).as("h"))
    val keep = hp.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("para_idx"))).as("k"))
      .select(col("h"), col("k.doc_id").as("doc_id"),
        col("k.para_idx").as("para_idx"))
    val totals = hp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_paras"))
    hp.join(keep, Seq("h", "doc_id", "para_idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("para_idx"), col("ptext")))),
            s => s.getField("ptext")),
          " ").as("clean_text"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("n_paras"), col("n_kept"), col("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Gated query: exact paragraph dedup over the documents table,
    * paragraphs induced as [[ParaWords]]-word windows (real text splits
    * on blank lines via [[paragraphsByDelimiter]]; the synthetic corpus
    * has no newlines, and the planted exact-dup documents make window
    * paragraphs genuinely collide across docs). */
  def txParagraphDedup(spark: SparkSession, dir: String): DataFrame =
    paragraphDedup(
      paragraphsByWindow(Tables.documents(spark, dir), ParaWords))

  val txParagraphDedupSql: String = s"""
    WITH d AS (
      SELECT doc_id, ${Portable.wordsSql("text")} AS words
      FROM documents WHERE text IS NOT NULL),
    pstarts AS (
      SELECT doc_id, words,
             unnest(generate_series(1, greatest(len(words), 1), $ParaWords))
               AS para_start
      FROM d),
    paras AS (
      SELECT doc_id,
             CAST((para_start - 1) // $ParaWords AS BIGINT) AS para_idx,
             array_to_string(words[para_start : para_start + ${ParaWords - 1}], ' ')
               AS ptext
      FROM pstarts),
    hp AS (
      SELECT doc_id, para_idx, ptext, ${Portable.hash60Sql("ptext")} AS h
      FROM paras),
    ranked AS (
      SELECT doc_id, para_idx, ptext,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, para_idx) AS rn
      FROM hp),
    tot AS (SELECT doc_id, COUNT(*) AS n_paras FROM hp GROUP BY doc_id)
    SELECT r.doc_id, t.n_paras, COUNT(*) AS n_kept,
           string_agg(r.ptext, ' ' ORDER BY r.para_idx) AS clean_text
    FROM ranked r JOIN tot t USING (doc_id)
    WHERE r.rn = 1
    GROUP BY r.doc_id, t.n_paras
    ORDER BY r.doc_id"""

  /** Block width for the gated intra-doc dedup — 2 words: the ~30-word
    * synthetic vocabulary makes within-doc 2-word-block repeats common
    * enough to exercise every branch (3-word blocks almost never repeat
    * inside one ~100-word doc); real text runs this on lines or
    * sentences — the knob, not the algorithm, is corpus-dependent. */
  val IntraW = 2

  /** INTRA-DOCUMENT dedup — repeated-content removal WITHIN each doc
    * (the RefinedWeb/MDR line-dedup step at the document scope, distinct
    * from every cross-corpus form: [[paragraphDedup]] keeps first
    * occurrence ACROSS docs, [[graft.operators.Dedup.spanDedup]] drops
    * corpus-repeated blocks; here a block repeated only inside its own
    * doc — navigation chrome, chorus lines, scraper stutter — keeps its
    * first occurrence and later copies are dropped, while the same
    * block in two different docs is untouched). Cut each doc into
    * non-overlapping w-word blocks, keep min position per distinct
    * (doc, block), reassemble in order.
    *
    * Scale shape: both aggregates are keyed BY doc (doc_id, blk) /
    * (doc_id) — partial aggregation collapses repeats map-side, the
    * shuffle carries ~tokens/w short rows partitioned by doc, and no
    * corpus-wide state exists at all, so the operator scales embarrass-
    * ingly: 100 TB is just more doc-partitions. The per-doc collect_list
    * is bounded by the doc's own block count. */
  def intradocDedup(docs: DataFrame, w: Int): DataFrame = {
    val ws = col("ws")
    val nblocks = ceil(size(ws).cast("double") / w).cast("int")
    val blocks = docs.filter(col("text").isNotNull)
      .withColumn("ws", Portable.words(col("text")))
      // greatest(…, 1) mirrors the SQL twin's greatest(len(ws), 1): an
      // empty word array would otherwise make sequence(0, -1) emit a
      // DESCENDING [0, -1] (two phantom blocks) while the oracle emits
      // one empty block — agree by construction, not by split() quirks
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), greatest(nblocks, lit(1)) - 1),
          i => struct(i.as("pos"),
            array_join(slice(ws, i * w + 1, lit(w)), " ").as("blk")))).as("b"))
      .select(col("doc_id"), col("b.pos").as("pos"), col("b.blk").as("blk"))
    blocks.groupBy(col("doc_id"), col("blk"))
      .agg(min(col("pos")).as("pos"), count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_blocks"),
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("blk")))),
            s => s.getField("blk")),
          " ").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  def txIntradocDedup(spark: SparkSession, dir: String): DataFrame =
    intradocDedup(Tables.documents(spark, dir), IntraW)

  val txIntradocDedupSql: String = s"""
    WITH d AS (
      SELECT doc_id, ${Portable.wordsSql("text")} AS ws
      FROM documents WHERE text IS NOT NULL),
    bs AS (
      SELECT doc_id, ws,
             unnest(generate_series(1, greatest(len(ws), 1), $IntraW))
               AS bstart
      FROM d),
    blocks AS (
      SELECT doc_id,
             CAST((bstart - 1) // $IntraW AS BIGINT) AS pos,
             array_to_string(ws[bstart : bstart + ${IntraW - 1}], ' ') AS blk
      FROM bs),
    kept AS (
      SELECT doc_id, blk, MIN(pos) AS pos, COUNT(*) AS cnt
      FROM blocks GROUP BY doc_id, blk)
    SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_blocks,
           COUNT(*) AS n_kept,
           string_agg(blk, ' ' ORDER BY pos) AS clean_text
    FROM kept GROUP BY doc_id ORDER BY doc_id"""

  /** Sampled-middle permille for the gated CCNet selection — CCNet's
    * published policy keeps `head` whole, SAMPLES `middle`, drops
    * `tail`; 500 = half the middle, decided by a deterministic
    * content-independent hash (same no-RNG-state posture as
    * [[txEpochMix]]: the same doc is always in or always out). */
  val CcnetMiddlePermille = 500L

  /** CCNet SELECTION policy over the bucket labels: the step after
    * bucketing that actually curates — head kept whole, middle
    * hash-sampled at `middlePermille`/1000, tail dropped. One
    * broadcast-threshold pass over the scored corpus; the sample
    * decision is a pure projection. */
  def ccnetSelect(buckets: DataFrame, middlePermille: Long): DataFrame =
    buckets
      .withColumn("__p", pmod(
        Portable.hash60(concat(lit("ccnet:"), col("doc_id").cast("string"))),
        lit(1000L)))
      .filter(col("bucket") === "head" ||
        (col("bucket") === "middle" && col("__p") < middlePermille))
      .select(col("doc_id"), col("lang"), col("mean_millibits"), col("bucket"))
      .orderBy(col("doc_id"))

  /** Gated query: CCNet selection over the doc-level buckets. */
  def txCcnetSelect(spark: SparkSession, dir: String): DataFrame =
    ccnetSelect(ccnetBuckets(Tables.documents(spark, dir)),
      CcnetMiddlePermille)

  val txCcnetSelectSql: String = s"""
    WITH ${bigramScoreCtesOf("documents")},
    scored AS (
      SELECT p.doc_id, d.lang,
             p.sum_bits * 1000 // p.n_bigrams AS mean_millibits
      FROM perdoc p JOIN documents d USING (doc_id)),
    hist AS (
      SELECT lang, mean_millibits, COUNT(*) AS cnt
      FROM scored GROUP BY lang, mean_millibits),
    cumh AS (
      SELECT lang, mean_millibits,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY mean_millibits) AS cum
      FROM hist),
    tot AS (SELECT lang, SUM(cnt) AS n FROM hist GROUP BY lang),
    th AS (
      SELECT lang,
             MIN(CASE WHEN cum >= (n + 2) // 3 THEN mean_millibits END) AS t1,
             MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN mean_millibits END) AS t2
      FROM cumh JOIN tot USING (lang) GROUP BY lang),
    buck AS (
      SELECT s.doc_id, s.lang, s.mean_millibits,
             CASE WHEN s.mean_millibits <= th.t1 THEN 'head'
                  WHEN s.mean_millibits <= th.t2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM scored s JOIN th USING (lang))
    SELECT doc_id, lang, mean_millibits, bucket
    FROM buck
    WHERE bucket = 'head' OR (bucket = 'middle' AND
      ((${Portable.hash60Sql("('ccnet:' || CAST(doc_id AS VARCHAR))")} % 1000)
        + 1000) % 1000 < $CcnetMiddlePermille)
    ORDER BY doc_id"""

  val txCcnetParagraphsSql: String = s"""
    WITH d AS (
      SELECT doc_id, lang, ${Portable.wordsSql("text")} AS words
      FROM documents WHERE text IS NOT NULL),
    pstarts AS (
      SELECT doc_id, lang, words,
             unnest(generate_series(1, greatest(len(words), 1), $ParaWords))
               AS para_start
      FROM d),
    paras AS (
      SELECT doc_id, lang,
             CAST((para_start - 1) // $ParaWords AS BIGINT) AS para_idx,
             array_to_string(words[para_start : para_start + ${ParaWords - 1}], ' ')
               AS ptext
      FROM pstarts),
    grams AS (
      SELECT doc_id, para_idx, unnest(${Portable.ngramsSql("ptext", 2)}) AS g
      FROM paras),
    big AS (SELECT g, COUNT(*) AS cnt2 FROM grams GROUP BY g),
    ctx AS (
      SELECT string_split(g, ' ')[1] AS w1, COUNT(*) AS cnt1
      FROM grams GROUP BY 1),
    perpara AS (
      SELECT doc_id, para_idx, COUNT(*) AS nb,
             CAST(SUM(CAST(length(bin(cnt1 // cnt2)) - 1 AS BIGINT)) AS BIGINT)
               AS sb
      FROM grams
      JOIN big USING (g)
      JOIN ctx ON string_split(grams.g, ' ')[1] = ctx.w1
      GROUP BY doc_id, para_idx),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_paras,
             CAST(SUM(sb * 1000 // nb) // COUNT(*) AS BIGINT) AS mean_millibits
      FROM perpara GROUP BY doc_id),
    scored AS (
      SELECT p.doc_id, dd.lang, p.n_paras, p.mean_millibits
      FROM perdoc p JOIN documents dd USING (doc_id)),
    hist AS (
      SELECT lang, mean_millibits, COUNT(*) AS cnt
      FROM scored GROUP BY lang, mean_millibits),
    cumh AS (
      SELECT lang, mean_millibits,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY mean_millibits) AS cum
      FROM hist),
    tot AS (SELECT lang, SUM(cnt) AS n FROM hist GROUP BY lang),
    th AS (
      SELECT lang,
             MIN(CASE WHEN cum >= (n + 2) // 3 THEN mean_millibits END) AS t1,
             MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN mean_millibits END) AS t2
      FROM cumh JOIN tot USING (lang) GROUP BY lang)
    SELECT s.doc_id, s.lang, s.n_paras, s.mean_millibits,
           CASE WHEN s.mean_millibits <= th.t1 THEN 'head'
                WHEN s.mean_millibits <= th.t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s JOIN th USING (lang)
    ORDER BY s.doc_id"""

  /** Per-language fractional epoch weights for the gated mix — the
    * LLaMA-style data-mixing recipe: upsample low-resource strata by a
    * non-integer factor. */
  val EPOCH_WEIGHTS: Seq[(String, Double)] =
    Seq("en" -> 1.0, "es" -> 1.5, "fr" -> 2.0, "de" -> 1.25, "zh" -> 1.75)

  /** Per-lang (base copies, extra-copy permille) as INTEGER constants,
    * derived once driver-side: computing frac(w)·1000 inside each
    * engine would compare Spark's truncating double→long cast against
    * DuckDB's rounding DECIMAL→BIGINT cast — exact for the pinned
    * weights but a latent gate-breaker for any weight whose frac·1000
    * is not float-exact (e.g. 1.9995). Integer literals cannot
    * disagree. */
  private val epochPermille: Seq[(String, Long, Long)] =
    EPOCH_WEIGHTS.map { case (l, w) =>
      (l, math.floor(w).toLong, math.round((w - math.floor(w)) * 1000))
    }

  /** Fractional-epoch oversampling: each doc is emitted
    * ⌊w⌋ (+1 with probability frac(w), decided by a deterministic
    * content-independent hash) times, where w is its stratum's epoch
    * weight. This is how training mixes upsample domains: weight 1.75
    * means every doc appears once, 75% of docs twice per epoch — with
    * no RNG state, the same doc always gets the same copy count.
    * copy_idx makes output rows distinct for downstream shuffles.
    * Weights < 1 subsume downsampling (some docs get 0 copies). */
  def txEpochMix(spark: SparkSession, dir: String): DataFrame = {
    def byLang(f: ((String, Long, Long)) => Long, dflt: Long): Column =
      epochPermille.tail.foldLeft(
        when(col("lang") === epochPermille.head._1, f(epochPermille.head))) {
        case (acc, t) => acc.when(col("lang") === t._1, f(t))
      }.otherwise(dflt)
    val bucket = pmod(
      Portable.hash60(concat(lit("epoch:"), col("doc_id").cast("string"))), lit(1000L))
    val copies = byLang(_._2, 1L) +
      when(bucket < byLang(_._3, 0L), 1L).otherwise(0L)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), copies.as("n_copies"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
      .orderBy(col("doc_id"), col("copy_idx"))
  }

  val txEpochMixSql: String = {
    val caseBase = epochPermille.map { case (l, b, _) => s"WHEN lang = '$l' THEN $b" }
      .mkString(" ")
    val casePm = epochPermille.map { case (l, _, p) => s"WHEN lang = '$l' THEN $p" }
      .mkString(" ")
    s"""
    WITH wts AS (
      SELECT doc_id, lang,
             CAST(CASE $caseBase ELSE 1 END AS BIGINT) AS base,
             CAST(CASE $casePm ELSE 0 END AS BIGINT) AS pm,
             ((${Portable.hash60Sql("('epoch:' || CAST(doc_id AS VARCHAR))")} % 1000)
              + 1000) % 1000 AS bucket
      FROM documents),
    copies AS (
      SELECT doc_id, lang,
             base + CASE WHEN bucket < pm THEN 1 ELSE 0 END AS n_copies
      FROM wts)
    SELECT doc_id, lang, unnest(range(1, n_copies + 1)) AS copy_idx
    FROM copies WHERE n_copies > 0
    ORDER BY doc_id, copy_idx"""
  }

  val txRedactSql: String = s"""
    WITH injected AS (
      SELECT doc_id,
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1 555 010 2368 at 10.0.'
                  || CAST(doc_id % 250 AS VARCHAR) || '.25' AS t
      FROM documents),
    scrubbed AS (SELECT doc_id, ${redactSql("t")} AS clean FROM injected)
    SELECT doc_id, md5(clean) AS clean_md5,
           (contains(clean, '[EMAIL]') AND contains(clean, '[PHONE]')
            AND contains(clean, '[IP]') AND NOT contains(clean, '@')
            AND NOT contains(clean, 'example.com')) AS fully_redacted
    FROM scrubbed
    ORDER BY doc_id"""

  /** Target mix shares (permille, sum 1000) for the token-budget mix —
    * the "rebalance the corpus toward low-resource strata" recipe
    * expressed as explicit budget shares rather than epoch multipliers. */
  val BUDGET_SHARES: Seq[(String, Long)] =
    Seq("en" -> 200L, "es" -> 300L, "fr" -> 150L, "de" -> 150L, "zh" -> 200L)

  /** Token-budget mixing: given a global token budget (here total/4) and
    * per-stratum target shares, derive each stratum's keep rate
    * rate = min(1, share·budget / stratum_tokens) and hash-sample docs
    * at that rate — how a training mix downsamples over-represented
    * languages to hit a token target. All arithmetic is integer
    * (permille rates, `div` floors) so Spark and the oracle agree
    * bit-for-bit; the sampling hash is the same content-independent
    * doc_id hash family as [[txEpochMix]]/[[txStratifiedSample]].
    *
    * Scale shape: one map-side-combined groupBy builds the per-lang
    * token counts (5 rows), the rate relation is broadcast back, and
    * the corpus passes once through a codegen'd filter — no corpus
    * shuffle, same posture as the other sampling ops. */
  def txTokenBudgetMix(spark: SparkSession, dir: String): DataFrame = {
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(Portable.words(col("text"))).cast("long").as("n_words"))
    val counts = lens.groupBy(col("lang")).agg(sum(col("n_words")).as("toks"))
    // single-partition window over the 5-row PER-STRATUM AGGREGATE (the
    // txStratifiedSample pattern — a non-foldable onePartition key, to
    // keep WindowExec's no-partition warning out of the logs), never
    // the corpus
    val rates = counts
      .withColumn("total", sum(col("toks"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(Portable.onePartition(col("toks")))))
      // ELSE 0, not null: a stratum lang outside BUDGET_SHARES must be
      // DROPPED (alloc 0 → rate 0), matching the oracle's inner join
      // against the shares VALUES — a null alloc would fall out of
      // least() and silently keep the whole unknown stratum
      .withColumn("alloc", expr("(total DIV 4) * "
        + "CASE " + BUDGET_SHARES.map { case (l, pm) =>
            s"WHEN lang = '$l' THEN ${pm}L" }.mkString(" ")
        + " ELSE 0L END DIV 1000"))
      .withColumn("rate_pm", least(lit(1000L), expr("alloc * 1000 DIV toks")))
      .select(col("lang"), col("rate_pm"))
    val bucket = pmod(
      Portable.hash60(concat(lit("budget:"), col("doc_id").cast("string"))),
      lit(1000L))
    lens.join(broadcast(rates), Seq("lang"))
      .filter(bucket < col("rate_pm"))
      .select(col("doc_id"), col("lang"), col("n_words"))
      .orderBy(col("doc_id"))
  }

  val txTokenBudgetMixSql: String = {
    val vals = BUDGET_SHARES.map { case (l, pm) => s"('$l', $pm)" }.mkString(", ")
    s"""
    WITH lens AS (
      SELECT doc_id, lang,
             CAST(len(${Portable.wordsSql("text")}) AS BIGINT) AS n_words
      FROM documents),
    c AS (SELECT lang, CAST(SUM(n_words) AS BIGINT) AS toks FROM lens GROUP BY lang),
    t AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM c),
    w AS (SELECT * FROM (VALUES $vals) AS v(lang, pm)),
    r AS (SELECT c.lang,
                 LEAST(1000, (((t.total // 4) * w.pm // 1000) * 1000) // c.toks)
                   AS rate_pm
          FROM c JOIN w USING (lang) CROSS JOIN t)
    SELECT lens.doc_id, lens.lang, lens.n_words
    FROM lens JOIN r USING (lang)
    WHERE ((${Portable.hash60Sql("('budget:' || CAST(doc_id AS VARCHAR))")} % 1000)
           + 1000) % 1000 < r.rate_pm
    ORDER BY lens.doc_id"""
  }

  /** Sliding-window chunk geometry: 64-word chunks, stride 48 (16-word
    * overlap) — the shape RAG/embedding pipelines feed to a context-
    * bounded encoder. Pinned so the gated query is deterministic; the
    * operator takes arbitrary (width, stride). */
  val CHUNK_WORDS = 64
  val CHUNK_STRIDE = 48

  /** Overlapping document chunking: each doc explodes into ⌈n/stride⌉
    * word-window chunks tagged (chunk_idx, chunk_start, n_chunk_words).
    *
    * Scale shape: one codegen'd projection + one generator — zero
    * shuffles, so at 100 TB this runs at scan speed and output
    * partitioning inherits the input's (each chunk stays on its doc's
    * partition — exactly what a downstream per-chunk embedding pass
    * wants). The overlap factor bounds output size at
    * width/stride × input bytes (4/3 here), not quadratic.
    */
  def chunkOverlap(docs: DataFrame, width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      s"need 0 < stride <= width, got width=$width stride=$stride")
    docs
      // null texts are dropped, not chunked: size(null words) = -1 under
      // the legacy semantics, and greatest(-1, 1) would fabricate one
      // empty chunk the DuckDB oracle (NULL string_split -> no rows)
      // never emits — the explicit filter keeps both engines agreeing
      .filter(col("text").isNotNull)
      .select(col("doc_id"), Portable.words(col("text")).as("words"))
      .select(col("doc_id"), col("words"),
        posexplode(sequence(lit(1), greatest(size(col("words")), lit(1)),
          lit(stride))).as(Seq("chunk_idx", "chunk_start")))
      .select(col("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        col("chunk_start").cast("int").as("chunk_start"),
        size(slice(col("words"), col("chunk_start"), lit(width)))
          .as("n_chunk_words"),
        concat_ws(" ", slice(col("words"), col("chunk_start"), lit(width)))
          .as("chunk_text"))
  }

  def txChunkOverlap(spark: SparkSession, dir: String): DataFrame =
    chunkOverlap(Tables.documents(spark, dir), CHUNK_WORDS, CHUNK_STRIDE)
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Per-stratum percent rank of document length — the curriculum /
    * length-balancing signal (train short-to-long, or cap per-length
    * mass). NOT computed with a corpus-wide window: `percent_rank()
    * OVER (PARTITION BY lang ...)` would funnel the whole corpus
    * through one reducer per language (5 languages = 5 hot reducers at
    * 100 TB). Instead the rank relation is built on the per-(lang,
    * length) AGGREGATE — thousands of rows regardless of corpus size —
    * and broadcast back onto the corpus: one map-side-combined groupBy,
    * one tiny window, two broadcast joins, no corpus-wide shuffle. The
    * oracle is the textbook window formulation, proving the distributed
    * decomposition value-identical (percent_rank = strictly-below count
    * / (group size - 1)). */
  def txLengthPctile(spark: SparkSession, dir: String): DataFrame = {
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(Portable.words(col("text"))).as("n_words"))
    val freq = lens.groupBy(col("lang"), col("n_words"))
      .agg(count(lit(1)).as("cnt"))
    val below = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_words"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranks = freq
      .withColumn("n_below", coalesce(sum(col("cnt")).over(below), lit(0L)))
    val totals = freq.groupBy(col("lang")).agg(sum(col("cnt")).as("n_g"))
    lens
      .join(broadcast(ranks.select(col("lang"), col("n_words"), col("n_below"))),
        Seq("lang", "n_words"))
      .join(broadcast(totals), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_words"),
        when(col("n_g") === 1, lit(0.0))
          .otherwise(col("n_below").cast("double") / (col("n_g") - 1))
          .as("len_pctile"))
      .orderBy(col("doc_id"))
  }

  val txLengthPctileSql: String = s"""
    WITH lens AS (
      SELECT doc_id, lang,
             CAST(len(${Portable.wordsSql("text")}) AS INT) AS n_words
      FROM documents)
    SELECT doc_id, lang, n_words,
           percent_rank() OVER (PARTITION BY lang ORDER BY n_words) AS len_pctile
    FROM lens
    ORDER BY doc_id"""

  val txChunkOverlapSql: String = s"""
    WITH d AS (
      SELECT doc_id, ${Portable.wordsSql("text")} AS words FROM documents
      WHERE text IS NOT NULL),
    c AS (
      SELECT doc_id, words,
             unnest(generate_series(1, greatest(len(words), 1), $CHUNK_STRIDE))
               AS chunk_start
      FROM d)
    SELECT doc_id,
           CAST((chunk_start - 1) // $CHUNK_STRIDE AS INT) AS chunk_idx,
           CAST(chunk_start AS INT) AS chunk_start,
           CAST(len(words[chunk_start : chunk_start + ${CHUNK_WORDS - 1}]) AS INT)
             AS n_chunk_words,
           array_to_string(words[chunk_start : chunk_start + ${CHUNK_WORDS - 1}], ' ')
             AS chunk_text
    FROM c
    ORDER BY doc_id, chunk_idx"""

  /** Target sample size for the gated PPS sample. */
  val PpsTargetK = 128L

  /** Probability-proportional-to-size systematic sampling — the weighted
    * sampler for token-budgeted corpus curation ("sample ~k docs with
    * inclusion probability ∝ weight"). The classic float formulation
    * (Efraimidis–Spirakis keys u^(1/w)) needs `pow`/`ln`, which are not
    * bit-stable across engines; systematic PPS is the integer-exact
    * equivalent: lay the docs on a line of cumulative weight, drop a
    * tick every `step = total/k` units, keep each doc once per tick
    * inside its weight interval (`n_picks` ≥ 2 ⟺ w > step, the
    * certainty stratum). No RNG, re-checkable per row in O(1), and
    * inclusion probability is exactly min(1, w/step) by construction.
    *
    * Scale shape: one map-side-combined total, then the same two-phase
    * prefix sum as [[Pack.exclusiveCumsum]] — no corpus-wide
    * single-partition window anywhere. The only driver value is the
    * scalar total. */
  def ppsSystematic(df: DataFrame, orderCol: String, weightCol: String,
      k: Long, buckets: Int = Pack.CumsumBuckets): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    // cast the SUM, not Row.getLong — getLong does not widen, so an
    // int-typed weight column would ClassCastException (the same trap
    // Pack.exclusiveCumsum documents); weights are integral by contract
    val row = df.agg(sum(col(weightCol)).cast("long")).head()
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val step = math.max(1L, total / k)
    Pack.exclusiveCumsum(df, orderCol, weightCol, buckets)
      .withColumn("n_picks",
        expr(s"(cum_excl + $weightCol) div ${step}L - cum_excl div ${step}L"))
      .filter(col("n_picks") > 0)
  }

  /** Gated query: PPS-sample ~[[PpsTargetK]] documents by `n_chars`
    * weight in doc_id order. */
  def txWeightedSample(spark: SparkSession, dir: String): DataFrame =
    ppsSystematic(
      Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
      "doc_id", "n_chars", PpsTargetK)
      .select(col("doc_id"), col("n_chars"), col("n_picks"))
      .orderBy(col("doc_id"))

  /** Oracle states the same layout law through one global window. */
  val txWeightedSampleSql: String = s"""
    WITH w AS (SELECT doc_id, n_chars FROM documents),
    s AS (SELECT GREATEST(CAST(1 AS BIGINT),
                 CAST(SUM(n_chars) AS BIGINT) // $PpsTargetK) AS step FROM w),
    c AS (
      SELECT doc_id, n_chars,
             CAST(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
      FROM w)
    SELECT doc_id, n_chars, n_picks FROM (
      SELECT doc_id, n_chars,
             (cum_excl + n_chars) // step - cum_excl // step AS n_picks
      FROM c, s)
    WHERE n_picks > 0
    ORDER BY doc_id"""

  /** Per-domain document quota. */
  val DomainCap = 15

  /** Generic per-group quota: the `k` best rows of each group by
    * (score DESC, id ASC), each with its 1-based in-group rank.
    *
    * Scale shape: this is NOT the `row_number() OVER (PARTITION BY
    * group …) <= k` window — that form sorts each group's ENTIRE row
    * set through one task, and domain size is the classic heavy-tail
    * (one hot domain can be 10% of a 100 TB corpus → one reducer gets
    * 10 TB). Instead ONE map-side-combined aggregate carries a bounded
    * heap of k (score, id) pairs per group
    * ([[graft.functions.TopKPairAgg]]): every map partition ships one
    * ≤k-element buffer per group, the exchange moves O(k · n_groups)
    * bytes no matter how the corpus is distributed, and the rank is
    * read off the already-sorted array position — no window anywhere. */
  def groupTopK(rows: DataFrame, groupCol: String, score: Column,
                id: Column, k: Int): DataFrame =
    rows
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKPairAgg.topK(score, id, k).as("kept"))
      .select(col(groupCol), posexplode(col("kept")).as(Seq("i", "p")))
      .select(col(groupCol),
        (col("i") + lit(1)).cast("int").as("rank_in_group"),
        col("p").getField("id").as("doc_id"),
        col("p").getField("score").as("score"))

  /** Gated query: keep the [[DomainCap]] highest-[[quality]] documents
    * of each source domain (ties → smallest doc_id) — the standard
    * domain-capping step of a crawl curation pipeline (no single host
    * may dominate the training mix). Quality is bit-stable across
    * engines (see [[quality]]), so ranks — and the score column itself —
    * hash-match the window-formulated DuckDB oracle exactly. */
  def txDomainCap(spark: SparkSession, dir: String): DataFrame =
    groupTopK(Tables.documents(spark, dir), "source", quality,
      col("doc_id"), DomainCap)
      .select(col("source"), col("rank_in_group").as("rank_in_domain"),
        col("doc_id"), col("score").as("quality"))
      .orderBy(col("source"), col("rank_in_domain"))

  /** Oracle states the quota as the window form — the bounded-heap
    * aggregate must be indistinguishable from it. */
  val txDomainCapSql: String = {
    val en = langProfiles.toMap.apply("en")
    s"""
    WITH c AS (
      SELECT doc_id, source,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
             CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS punct,
             CAST(len(regexp_extract_all(text, '$en')) AS DOUBLE) AS stop
      FROM documents),
    q AS (
      SELECT doc_id, source,
             least(n_words / 100.0, 1.0) * 0.5
               + least(stop / n_words * 10.0, 1.0) * 0.3
               + (1.0 - least(punct / n_chars * 20.0, 1.0)) * 0.2 AS quality
      FROM c),
    r AS (
      SELECT source, doc_id, quality,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY quality DESC, doc_id) AS INT) AS rank_in_domain
      FROM q)
    SELECT source, rank_in_domain, doc_id, quality
    FROM r WHERE rank_in_domain <= $DomainCap
    ORDER BY source, rank_in_domain"""
  }

  /** Temperature-weighted mixing (α = 1/2): sample strata proportional
    * to n^α so head domains shrink and tail domains survive — the
    * multilingual sampling recipe from XLM-R-style pretraining, here as
    * exact integer apportionment rather than probabilistic rates (the
    * contrast with [[txTokenBudgetMix]], which hits shares only in
    * expectation). Engine-exact throughout: weights are floor(sqrt(n))
    * — IEEE-754 `sqrt` is correctly rounded and counts are exactly
    * representable doubles, so both engines compute the SAME double and
    * the SAME floor (unlike log/exp, sqrt has a bit contract, see
    * [[graft.operators.TextAnalysis.surprisal]]'s whole-bit workaround
    * for the functions that don't); quotas are Hamilton
    * largest-remainder over a budget of total/4 docs (base =
    * budget·w div W, +1 to the largest remainders, ties by stratum
    * name); each stratum then keeps exactly its quota docs — the ones
    * with the smallest content-independent selection hashes.
    *
    * Scale shape: the apportionment runs on the ≤|strata|-row count
    * aggregate (the [[txStratifiedSample]] posture — single-partition
    * windows touch ~20 rows, never the corpus); quotas broadcast back;
    * the per-stratum ranked pick is one hash-partitioned window. At
    * 100 TB with fat strata, swap the full rank window for the
    * two-phase cutoff — a scan-side hash-threshold filter at ~2× the
    * implied rate, then the exact window over the ~quota survivors —
    * the same candidates-then-verify shape [[Dedup]] uses. */
  def temperatureMix(docs: DataFrame, stratum: Column): DataFrame = {
    // single-partition window over the ≤|strata|-row aggregate. The key
    // must be constant but NON-FOLDABLE: Spark 4's
    // EliminateWindowPartitions optimizer rule strips foldable keys
    // (lit(1) included), silently resurrecting WindowExec's
    // "No Partition Defined" warning the key existed to avoid —
    // `n % 1` (n = the group count, ≥ 1, never null) survives the rule
    // and still evaluates to one partition. PlanSpec pins the absence
    // of empty partitionSpecs suite-wide.
    val tiny = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("n"), lit(1L)))
    val quotas = docs.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n"))
      .withColumn("wt", expr("CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)"))
      .withColumn("budget", expr("SUM(n) OVER (PARTITION BY n % 1) DIV 4"))
      .withColumn("wsum", expr("SUM(wt) OVER (PARTITION BY n % 1)"))
      .withColumn("base", expr("budget * wt DIV wsum"))
      .withColumn("rem", expr("(budget * wt) % wsum"))
      .withColumn("extra_rank",
        row_number().over(tiny.orderBy(col("rem").desc, col("stratum"))))
      .withColumn("quota", col("base") +
        when(col("extra_rank") <= col("budget") - sum(col("base")).over(tiny), 1L)
          .otherwise(0L))
      .select(col("stratum"), col("quota"))
    docs.select(col("doc_id"), stratum.as("stratum"))
      .withColumn("pick_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("stratum"))
          .orderBy(
            Portable.hash60(concat(lit("temp:"), col("doc_id").cast("string"))),
            col("doc_id"))))
      .join(broadcast(quotas), Seq("stratum"))
      .filter(col("pick_rank") <= col("quota"))
      .select(col("doc_id"), col("stratum"), col("pick_rank"))
  }

  def txTemperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMix(Tables.documents(spark, dir), col("source"))
      .select(col("doc_id"), col("stratum").as("source"), col("pick_rank"))
      .orderBy(col("doc_id"))

  /** Oracle states the identical apportionment + ranked pick. */
  val txTemperatureMixSql: String = s"""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source),
    a AS (
      SELECT source, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt,
             CAST(SUM(n) OVER () AS BIGINT) AS total
      FROM c),
    b AS (
      SELECT source, wt, (total // 4) AS budget,
             CAST(SUM(wt) OVER () AS BIGINT) AS wsum
      FROM a),
    d AS (
      SELECT source, budget, budget * wt // wsum AS base,
             (budget * wt) % wsum AS rem
      FROM b),
    q AS (
      SELECT source,
             base + CASE WHEN CAST(row_number() OVER (ORDER BY rem DESC, source)
                               AS BIGINT)
                          <= budget - CAST(SUM(base) OVER () AS BIGINT)
                    THEN 1 ELSE 0 END AS quota
      FROM d),
    rk AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY ${Portable.hash60Sql("('temp:' || CAST(doc_id AS VARCHAR))")},
                        doc_id) AS INT) AS pick_rank
      FROM documents)
    SELECT rk.doc_id, rk.source, rk.pick_rank
    FROM rk JOIN q USING (source)
    WHERE pick_rank <= quota
    ORDER BY rk.doc_id"""

  // ----------------------------------------------- PII audit (r11)

  /** Gate corpus for the PII AUDIT pass: the (PII-free) documents table
    * extended with PLANTED PII — docs 0..59 re-ingested at +60000 with
    * one deterministic doc-id-derived span appended (type rotates by
    * id mod 4 over email / dashed phone / IP / SSN), plus one +70000
    * doc carrying all four types AND two negative controls (a 3-group
    * dotted version string and a non-conforming digit run) whose
    * survival the oracle hash pins. Spark and the oracle derive the
    * same strings from the same ids (format_string ≡ printf). */
  def piiCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val planted = docs.filter(col("doc_id") < 60)
      .select((col("doc_id") + 60000).as("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            format_string(" contact user%05d@example.com now", col("doc_id")))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            format_string(" call 415-555-%04d today", pmod(col("doc_id"), lit(10000))))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            format_string(" host 10.0.%d.%d up",
              pmod(col("doc_id"), lit(200)), pmod(col("doc_id"), lit(100))))
          .otherwise(
            format_string(" ssn 123-45-%04d noted", pmod(col("doc_id"), lit(10000)))))
          .as("text"))
    val mixed = docs.filter(col("doc_id") === 60)
      .select((col("doc_id") + 70000).as("doc_id"),
        concat(col("text"), lit(" alice@example.com 415-555-0000 10.0.0.1" +
          " 123-45-6789 version 1.2.3 order 12-34-56")).as("text"))
    docs.unionByName(planted).unionByName(mixed)
  }

  /** Per-type PII occurrence counts + the scrubbed text, over the
    * SHARED [[piiPatterns]]/[[redact]] primitives the `tx_redact` gate
    * already pins — this gate adds the AUDIT surface a compliance pass
    * needs (which types, how many, counted on the ORIGINAL text before
    * scrubbing) and the negative-control pins. Counts group patterns
    * by their replacement token (both phone forms land in n_phone).
    * Scale shape: one narrow codegen'd projection, zero shuffle. */
  def piiAudit(docs: DataFrame): DataFrame = {
    val byToken = piiPatterns.groupBy(_._1).toSeq.sortBy(_._1)
    val counts = byToken.map { case (token, pats) =>
      val name = "n_" + token.stripPrefix("[").stripSuffix("]")
        .toLowerCase(java.util.Locale.ROOT)
      pats.map { case (_, re) => regexp_count(col("text"), lit(re)).cast("long") }
        .reduce(_ + _).as(name)
    }
    docs.select(Seq(col("doc_id")) ++ counts ++
        Seq(redact(col("text")).as("redacted_text")): _*)
      .orderBy(col("doc_id"))
  }

  /** Gated query: the audit over the planted corpus. */
  def txPiiAudit(spark: SparkSession, dir: String): DataFrame =
    piiAudit(piiCorpus(spark, dir))

  val txPiiAuditSql: String = {
    val corpus = s"""pii AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 60000 AS doc_id,
             text || CASE doc_id % 4
               WHEN 0 THEN printf(' contact user%05d@example.com now', doc_id)
               WHEN 1 THEN printf(' call 415-555-%04d today', doc_id % 10000)
               WHEN 2 THEN printf(' host 10.0.%d.%d up', doc_id % 200, doc_id % 100)
               ELSE printf(' ssn 123-45-%04d noted', doc_id % 10000) END AS text
      FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 70000 AS doc_id,
             text || ' alice@example.com 415-555-0000 10.0.0.1' ||
                     ' 123-45-6789 version 1.2.3 order 12-34-56' AS text
      FROM documents WHERE doc_id = 60)"""
    val counts = piiPatterns.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (token, pats) =>
        val name = "n_" + token.stripPrefix("[").stripSuffix("]")
          .toLowerCase(java.util.Locale.ROOT)
        pats.map { case (_, re) =>
          s"len(regexp_extract_all(text, '$re'))" }.mkString("CAST(", " + ", s" AS BIGINT) AS $name")
      }.mkString(",\n           ")
    s"""
    WITH $corpus
    SELECT doc_id,
           $counts,
           ${redactSql("text")} AS redacted_text
    FROM pii ORDER BY doc_id"""
  }
}
