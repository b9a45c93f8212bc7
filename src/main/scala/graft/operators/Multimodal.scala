package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[StubCodec]]); everything around it
  * — binary schema, typed Dataset plumbing, partition-iterator batch
  * shape, frame explosion — is real and oracle-tested. Payloads are
  * synthesized from `documents.text` (UTF-8 bytes) so the oracle can
  * reproduce byte lengths and digests.
  *
  * Scale notes: per-row decode runs inside `mapPartitions` so a real codec
  * would amortize init per PARTITION (the per-row-UDF anti-pattern
  * re-initializes per row); frames explode through a generator, never a
  * collect.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long, n_frames: Long,
      width: Long, height: Long, head_char: String)

  val FrameBytes = 256

  /** Synthesized media table: payload = UTF-8 bytes of the document text,
    * kind round-robins image/audio/video. */
  def media(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** The stubbed codec: deterministic pseudo-decode of a payload.
    * A real deployment would replace [[decode]] with an actual codec call
    * — the signature (bytes in, features out, called per partition batch)
    * is the real contract. */
  object StubCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val n = row.payload.length.toLong
      // fake dimensions derived from content length — stands in for a
      // parsed header; deterministic so the oracle can replicate
      val width = 16L * (1L + n % 64L)
      val height = 16L * (1L + n % 48L)
      // ceil(n / FrameBytes): `n/FB + 1` over-counted by one whenever n
      // was an exact multiple — disagreeing with mmFrameSample's frame
      // enumeration for the same payload
      val frames = if (n == 0L) 0L else (n - 1L) / FrameBytes + 1L
      val head = if (row.payload.isEmpty) "" else new String(row.payload, 0, 1, "UTF-8")
      MediaFeatures(row.doc_id, row.kind, n, frames, width, height, head)
    }
  }

  /** Feature extraction over the binary column — mapPartitions so codec
    * init (here: none) amortizes per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs would init here, once per partition
      rows.map(StubCodec.decode)
    }
  }

  /** Oracled query: metadata + stub-decoded features per media row. */
  def mmExtractFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(media(spark, dir)).toDF().orderBy(col("doc_id"))

  val mmExtractFeaturesSql: String = """
    SELECT doc_id,
           ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
           octet_length(encode(text)) AS n_bytes,
           CASE WHEN octet_length(encode(text)) = 0 THEN 0
                ELSE (octet_length(encode(text)) - 1) // 256 + 1 END AS n_frames,
           16 * (1 + octet_length(encode(text)) % 64) AS width,
           16 * (1 + octet_length(encode(text)) % 48) AS height,
           substring(text, 1, 1) AS head_char
    FROM documents ORDER BY doc_id"""

  final case class ResizedMedia(
      doc_id: Long, in_w: Long, in_h: Long, out_w: Long, out_h: Long,
      resized_digest: String)

  /** Letterbox target box for [[mmResize]]. */
  val ResizeTarget = 224L

  /** Stubbed resize of the "image" rows: aspect-preserving letterbox into
    * a [[ResizeTarget]]² box with EXACT integer arithmetic
    * (`dim · target / max(w, h)` in long division — reproducible in any
    * engine, no float rounding), plus a digest standing in for the
    * re-encoded payload (md5 of payload ++ ":WxH"). Runs through the
    * same `mapPartitions` codec contract as [[extractFeatures]] — a real
    * resampler would init per partition and transform the pixel buffer
    * where the stub digests. */
  def resizeMedia(media: Dataset[MediaRow]): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { row =>
        val f = StubCodec.decode(row)
        val m = math.max(f.width, f.height)
        val outW = f.width * ResizeTarget / m
        val outH = f.height * ResizeTarget / m
        md.reset()
        md.update(row.payload)
        md.update(s":${outW}x$outH".getBytes("UTF-8"))
        val digest = md.digest().map("%02x".format(_)).mkString
        ResizedMedia(row.doc_id, f.width, f.height, outW, outH, digest)
      }
    }
  }

  /** Oracled query: resized dims + digest for every image row. */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    resizeMedia(media(spark, dir)).toDF().orderBy(col("doc_id"))

  val mmResizeSql: String = s"""
    WITH f AS (
      SELECT doc_id, text,
             16 * (1 + octet_length(encode(text)) % 64) AS in_w,
             16 * (1 + octet_length(encode(text)) % 48) AS in_h
      FROM documents WHERE doc_id % 3 = 0),
    r AS (
      SELECT doc_id, text, in_w, in_h,
             in_w * $ResizeTarget // greatest(in_w, in_h) AS out_w,
             in_h * $ResizeTarget // greatest(in_w, in_h) AS out_h
      FROM f)
    SELECT doc_id, in_w, in_h, out_w, out_h,
           md5(text || ':' || out_w || 'x' || out_h) AS resized_digest
    FROM r ORDER BY doc_id"""

  /** Frame sampling for "video" rows: every FrameBytes-sized chunk becomes
    * a (doc_id, frame_idx, frame_digest) row via a generator explode. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(3)) === 2) // the "video" rows
      // an empty payload has NO frames; without this guard Spark's
      // truncating `div` emits frame 0 while DuckDB's flooring `//`
      // emits none — a latent oracle divergence
      .filter(length(col("text")) > 0)
    docs
      .withColumn("last_frame", expr(s"cast((length(text) - 1) div $FrameBytes as bigint)"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("last_frame"))).as("frame_idx"))
      // md5 over the frame's character slice (ASCII corpus: chars == bytes)
      .select(col("doc_id"), col("frame_idx"),
        md5(col("text").substr((col("frame_idx") * FrameBytes + 1).cast("int"),
          lit(FrameBytes))).as("frame_digest"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val mmFrameSampleSql: String = s"""
    SELECT doc_id, frame_idx,
           md5(substring(text, (frame_idx * $FrameBytes + 1)::INT, $FrameBytes)) AS frame_digest
    FROM (
      SELECT doc_id, text, unnest(range(0, (length(text) - 1) // $FrameBytes + 1)) AS frame_idx
      FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0)
    ORDER BY doc_id, frame_idx"""

  /** Audio segmentation window: [[SegBytes]]-byte windows every
    * [[HopBytes]] bytes — 25% overlap, the speech-model chunking shape
    * (overlap so no acoustic event is lost on a boundary). A real
    * pipeline would window SAMPLES after decode; the byte-window stands
    * in with the same plumbing. */
  val SegBytes = 512
  val HopBytes = 384

  /** Segment the "audio" rows into overlapping fixed windows: each
    * window start (0, hop, 2·hop, … < n) becomes a
    * (doc_id, seg_idx, seg_len, seg_digest) row via a generator explode —
    * tail windows are short, empty payloads yield no windows. Same
    * scale contract as [[mmFrameSample]]: the explode is a generator
    * inside the scan stage (no shuffle until a consumer asks), and
    * per-segment work would run inside `mapPartitions` with
    * per-partition codec init in a real deployment. */
  def mmAudioSegments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(3)) === 1) // the "audio" rows
      .filter(length(col("text")) > 0)
    docs
      .withColumn("last_seg", expr(s"cast((length(text) - 1) div $HopBytes as bigint)"))
      .select(col("doc_id"), col("text"), col("last_seg"),
        explode(sequence(lit(0L), col("last_seg"))).as("seg_idx"))
      .select(col("doc_id"), col("seg_idx"),
        least(lit(SegBytes.toLong),
          length(col("text")).cast("long") - col("seg_idx") * HopBytes).as("seg_len"),
        md5(col("text").substr((col("seg_idx") * HopBytes + 1).cast("int"),
          lit(SegBytes))).as("seg_digest"))
      .orderBy(col("doc_id"), col("seg_idx"))
  }

  val mmAudioSegmentsSql: String = s"""
    SELECT doc_id, seg_idx,
           least($SegBytes, length(text) - seg_idx * $HopBytes) AS seg_len,
           md5(substring(text, (seg_idx * $HopBytes + 1)::INT, $SegBytes)) AS seg_digest
    FROM (
      SELECT doc_id, text, unnest(range(0, (length(text) - 1) // $HopBytes + 1)) AS seg_idx
      FROM documents WHERE doc_id % 3 = 1 AND length(text) > 0)
    ORDER BY doc_id, seg_idx"""

  /** Exact dedup of the BINARY payload column — the asset-store dedup a
    * media pipeline runs before any decode: identical payload bytes
    * (re-uploaded images, mirrored files) collapse to one kept copy by
    * 128-bit content digest. The [[graft.operators.Dedup.survivors]]
    * posture applied at the binary tier: ONLY (doc_id, digest) ever
    * shuffles — payload bytes stay at the scan, which at 100 TB of
    * media is the difference between a 16-byte/row exchange and moving
    * the asset store through the cluster. Runs over the pipeline corpus
    * (planted byte-exact copies at doc_id+20000) so the gate exercises
    * real collapses, and emits every row with a `keep` verdict so the
    * oracle pins the full digest→representative mapping, not just the
    * survivor set. */
  def mmExactDedup(spark: SparkSession, dir: String): DataFrame = {
    val m = Dedup.pipelineCorpus(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val digests = graft.Caches.persist(
      m.select(col("doc_id"), md5(col("payload")).as("payload_md5")))
    val keep = digests.groupBy(col("payload_md5"))
      .agg(min(col("doc_id")).as("keep_id"))
    digests.join(keep, "payload_md5")
      .select(col("doc_id"), col("payload_md5"),
        (col("doc_id") === col("keep_id")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: md5 over the VARCHAR equals md5 over its UTF-8 bytes —
    * the same equivalence [[media]]'s `text.cast("binary")` payload
    * synthesis relies on. */
  val mmExactDedupSql: String = s"""
    WITH aug AS (${Dedup.augmentedSql}),
    ${Dedup.pipeSql},
    d AS (SELECT doc_id, md5(text) AS payload_md5 FROM pipe),
    k AS (SELECT payload_md5, MIN(doc_id) AS keep_id FROM d GROUP BY payload_md5)
    SELECT doc_id, payload_md5, doc_id = keep_id AS keep
    FROM d JOIN k USING (payload_md5)
    ORDER BY doc_id"""

  // ------------------------------------------- chunk-level binary near-dup

  /** Rolling-hash window width (bytes) of the content-defined chunker. */
  val ChunkW = 16

  /** Boundary divisor — a cut lands where the window hash ≡ 0 (mod this),
    * so expected chunk length ≈ this many bytes. 32 for the gate corpus
    * (median doc ~310 bytes → ~10 chunks/doc); a real asset store tunes
    * this to KB–MB chunks — pure constant, same plan. */
  val ChunkDivisor = 32

  /** Mutations are planted only on payloads long enough to carry several
    * chunks (> this many bytes): linking an append/truncate by chunk
    * containment is information-theoretically impossible on a payload of
    * ~1 chunk (its only chunk is the thing that changed). */
  val ChunkMutMinLen = 256

  /** Containment threshold for emitting a near-dup pair. */
  val ChunkContainment = 0.5

  /** Planted append suffix — long enough (~72 bytes ≈ one expected chunk)
    * that the appended variant grows real new chunk content rather than
    * only perturbing the final chunk. */
  val AppendTail =
    " [[chunk-append-tail 0123456789abcdefghijklmnopqrstuvwxyz 9876543210]]"

  /** Corpus for the chunk near-dup gate: the pipeline corpus (exact
    * copies at +20000, head-trimmed near-dups at +10000) EXTENDED with
    * byte-level mutations no whole-payload digest can link —
    * appended payloads (+30000: docs 0..24 with [[AppendTail]] glued on)
    * and truncated payloads (+40000: docs 25..49 clipped to ¾ length).
    * These are the re-encoded/extended/clipped asset-store arrivals
    * [[mmExactDedup]]'s planted byte-exact copies deliberately are not. */
  def chunkCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val appended = docs
      .filter(col("doc_id") < 25 && length(col("text")) > ChunkMutMinLen)
      .select((col("doc_id") + 30000).as("doc_id"),
        concat(col("text"), lit(AppendTail)).as("text"))
    val truncated = docs
      .filter(col("doc_id") >= 25 && col("doc_id") < 50 &&
        length(col("text")) > ChunkMutMinLen)
      .select((col("doc_id") + 40000).as("doc_id"),
        expr("substring(text, 1, cast((3 * length(text)) div 4 as int))")
          .as("text"))
    Dedup.pipelineCorpus(spark, dir)
      .unionByName(appended).unionByName(truncated)
  }

  /** Chunk-level near-duplicate pairs over the binary payload column —
    * the asset-store near-dup [[mmExactDedup]] structurally cannot be:
    * content-defined chunking ([[graft.functions.CdcChunkHash60s]], one
    * codegen'd rolling-hash kernel) splits each payload at
    * content-determined positions, so an append/truncate/prepend
    * disturbs only the chunks it touches and every later boundary
    * REALIGNS (self-synchronization — a fixed-size blocker would shift
    * every subsequent block and share nothing). Pairs sharing enough
    * distinct chunks clear a containment threshold:
    * shared / min(|chunks_a|, |chunks_b|) ≥ [[ChunkContainment]].
    *
    * Scale shape: ONLY (doc_id, 8-byte chunk hash) rows ever shuffle —
    * payload bytes stay at the scan (the [[mmExactDedup]] argument, here
    * surviving mutation). The chunk-hash equi-join is bounded by real
    * content overlap, never n²; the containment tail is one count
    * aggregate per colliding pair. At 100 TB the additions are a
    * document-frequency cap on pathologically hot chunks (shared
    * boilerplate headers — the stop-shingle treatment) and FastCDC
    * min/max chunk clamps (see the kernel scaladoc); both are
    * constant-factor tuning of this exact plan. */
  def mmChunkNearDup(spark: SparkSession, dir: String): DataFrame = {
    val corpus = chunkCorpus(spark, dir)
    val rows = graft.Caches.persist(corpus.select(col("doc_id"),
      explode(graft.functions.CdcChunkHash60s.chunkHashes(
        col("text").cast("binary"), ChunkW, ChunkDivisor)).as("h")))
    chunkPairTail(rows)
  }

  /** ONE shared/containment tail over a distinct (doc_id, h) chunk
    * relation — shared by the plain, df-capped, and clamped variants so
    * the pair semantics cannot drift between them. `sizesOf` lets the
    * df-capped variant count per-doc sizes over ALL chunks while the
    * pair join runs on the capped relation: a filter must only ever
    * REMOVE evidence — recomputing denominators post-filter guts short
    * boilerplate-heavy docs and inflates the surviving ratio (measured:
    * one straddling chunk crossing the 0.5 threshold). */
  private def chunkPairTail(rows: DataFrame,
                            sizesOf: DataFrame = null): DataFrame = {
    val szRel = Option(sizesOf).getOrElse(rows)
    val sizes = szRel.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = rows.select(col("doc_id").as("id_a"), col("h"))
    val b = rows.select(col("doc_id").as("id_b"), col("h"))
    val shared = a.join(b, "h").filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("containment",
        col("shared") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= ChunkContainment)
      .select(col("id_a"), col("id_b"), col("shared"),
        col("n_a"), col("n_b"), col("containment"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The boundary predicate's window hash, unrolled as explicit SQL
    * terms: Σ byte(q−j)·B^j mod P — the window-local formulation the
    * kernel's rolling update equals algebraically (CdcChunkSpec pins
    * the identity). `ord` = codepoint = byte on the ASCII corpus. */
  private def chunkWindowSumSql(w: Int): String =
    (0 until w).map { j =>
      val pw = (0 until j).foldLeft(1L)((r, _) =>
        r * graft.functions.CdcChunkHash60Kernel.B % graft.functions.Portable.P)
      s"ord(substring(text, (q - $j)::INT, 1))::BIGINT * $pw"
    }.mkString("(", " + ", ")")

  /** The chunk-mutation corpus as SQL CTEs ending in `mcorp` — shared
    * by the plain and df-capped oracles. */
  private val chunkCorpusCtesSql: String = s"""aug AS (${Dedup.augmentedSql}),
    ${Dedup.pipeSql},
    mcorp AS (
      SELECT doc_id, text FROM pipe
      UNION ALL
      SELECT doc_id + 30000 AS doc_id, text || '$AppendTail' AS text
      FROM documents WHERE doc_id < 25 AND length(text) > $ChunkMutMinLen
      UNION ALL
      SELECT doc_id + 40000 AS doc_id,
             substring(text, 1, (3 * length(text)) // 4) AS text
      FROM documents
      WHERE doc_id >= 25 AND doc_id < 50 AND length(text) > $ChunkMutMinLen)"""

  /** The divisor-rule candidate cut positions of `corpus` docs, as a
    * sorted list column `cands` — the POSITIONAL half both the plain
    * and the clamped oracle share (the clamped kernel's window
    * deliberately straddles cuts, so its candidate set is this exact
    * stateless one). */
  private def chunkCandCteSql(corpus: String): String = {
    val P = graft.functions.Portable.P
    s"""ce0 AS (
      SELECT doc_id, text,
             list_sort(list_distinct(
               list_filter(range($ChunkW, length(text) + 1), q ->
                 ${chunkWindowSumSql(ChunkW)} % $P % $ChunkDivisor = 0))) AS cands
      FROM $corpus WHERE length(text) > 0)"""
  }

  /** (doc_id, text, ends) → per-doc distinct chunk hashes
    * `ch(doc_id, h)`: per-chunk hash60 of each substring slice between
    * consecutive ends. Shared by every chunk oracle. */
  private def chunkSliceHashCteSql(from: String): String =
    s"""ch AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(ends) + 1), i ->
               ${graft.functions.Portable.hash60Sql(
                 """substring(text,
                   (CASE WHEN i = 1 THEN 1 ELSE ends[i - 1] + 1 END)::INT,
                   (ends[i] - CASE WHEN i = 1 THEN 0 ELSE ends[i - 1] END)::INT)""")}))) AS h
      FROM $from)"""

  /** `mcorp` → per-doc distinct chunk hashes `ch(doc_id, h)`: candidate
    * cut positions by the window-hash rule, forced end cut, per-chunk
    * hash60 of the substring slice. Shared by both unclamped oracles. */
  private def chunkHashCtesSql(corpus: String): String =
    s"""${chunkCandCteSql(corpus)},
    ce AS (
      SELECT doc_id, text,
             list_sort(list_distinct(list_append(cands,
               length(text)::BIGINT))) AS ends
      FROM ce0),
    ${chunkSliceHashCteSql("ce")}"""

  /** Shared/containment tail: pair join over `chr(doc_id, h)`, per-doc
    * sizes over `sizesFrom` (= `chr` unless a df cap separates the two —
    * see [[chunkPairTail]]'s denominator note). */
  private def chunkPairTailSql(sizesFrom: String = "chr"): String = s"""sz AS (SELECT doc_id, COUNT(*) AS n FROM $sizesFrom GROUP BY doc_id),
    pr AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM chr a JOIN chr b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, shared, na.n AS n_a, nb.n AS n_b,
           shared / least(na.n, nb.n) AS containment
    FROM pr JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
    WHERE shared / least(na.n, nb.n) >= $ChunkContainment
    ORDER BY id_a, id_b"""

  /** Oracle: the identical chunking stated positionally, then the
    * shared/containment tail over every chunk. */
  val mmChunkNearDupSql: String = s"""
    WITH $chunkCorpusCtesSql,
    ${chunkHashCtesSql("mcorp")},
    chr AS (SELECT doc_id, h FROM ch),
    ${chunkPairTailSql()}"""

  // -------------------------------------------- hot-chunk df cap variant

  /** Document-frequency cap on chunks entering the pair join — the
    * stop-shingle treatment ([[graft.operators.Dedup]]'s df pruning) at
    * the binary tier. A chunk shared by more than this many documents is
    * boilerplate (container headers, codec preambles, license blocks),
    * and its df² candidate contribution is exactly the quadratic mass
    * the 100 TB plan must not pay; genuine mutation linkage rides on
    * RARE chunks (df 2–4 on this corpus), far below the cap. */
  val HotChunkDfCap = 16

  /** Planted boilerplate preamble (~130 bytes ≈ 4 expected chunks) —
    * prepended to the [[chunkCapCorpus]] header family so the cap has a
    * genuinely hot chunk set (df ≈ family size ≫ cap) to kill. ASCII
    * and quote-free, per the oracle's codepoint≡byte contract. */
  val BoilerplateHeader =
    "[[asset-preamble v1 :: standard container header block :: " +
      "aaaabbbbccccddddeeeeffffgggghhhhiiiijjjjkkkkllllmmmmnnnnoooo]] "

  /** [[chunkCorpus]] extended with a BOILERPLATE family: docs 50..149
    * re-ingested at +50000 with [[BoilerplateHeader]] prepended. The
    * header's internal chunks are byte-identical across the whole
    * family (cut positions inside the header depend only on header
    * bytes), so their df ≈ 100 ≫ [[HotChunkDfCap]] — the planted hot
    * chunks — while each member still shares its ORIGINAL's content
    * chunks (df ~2) for legitimate prepend-mutation linkage. */
  def chunkCapCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val headed = docs
      .filter(col("doc_id") >= 50 && col("doc_id") < 150)
      .select((col("doc_id") + 50000).as("doc_id"),
        concat(lit(BoilerplateHeader), col("text")).as("text"))
    chunkCorpus(spark, dir).unionByName(headed)
  }

  /** [[mmChunkNearDup]] with the hot-chunk df cap, over the corpus with
    * the planted boilerplate family: chunks with df > [[HotChunkDfCap]]
    * drop BEFORE the pair join, while per-doc sizes stay over ALL
    * chunks — the cap prunes EVIDENCE, never denominators. (The
    * post-filter-denominator alternative inflates ratios: a short
    * mostly-boilerplate doc loses its header chunks from min(n_a, n_b)
    * and a single surviving straddle chunk crosses the threshold —
    * measured on this corpus before the semantics were fixed.) Two
    * effects, both oracle-pinned: the df² join mass of the hot chunks
    * never shuffles, and boilerplate-only pairs (two short docs whose
    * overlap is the shared header) stop clearing the threshold —
    * the capped gate's planted header family links each member to its
    * original through CONTENT chunks only. */
  def mmChunkNearDupCap(spark: SparkSession, dir: String): DataFrame = {
    val corpus = chunkCapCorpus(spark, dir)
    val rows = graft.Caches.persist(corpus.select(col("doc_id"),
      explode(graft.functions.CdcChunkHash60s.chunkHashes(
        col("text").cast("binary"), ChunkW, ChunkDivisor)).as("h")))
    // rows are distinct (doc_id, h) by kernel construction, so count = df
    val rare = rows.join(
      rows.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= HotChunkDfCap).select(col("h")),
      "h")
    val kept = graft.Caches.persist(rare.select(col("doc_id"), col("h")))
    chunkPairTail(kept, sizesOf = rows)
  }

  /** Oracle for the capped variant: the same chunk CTEs over the
    * extended corpus, one df aggregate, chunks at df ≤ cap survive into
    * the shared pair tail. */
  val mmChunkNearDupCapSql: String = s"""
    WITH $chunkCorpusCtesSql,
    hcorp AS (
      SELECT doc_id, text FROM mcorp
      UNION ALL
      SELECT doc_id + 50000 AS doc_id, '$BoilerplateHeader' || text AS text
      FROM documents WHERE doc_id >= 50 AND doc_id < 150),
    ${chunkHashCtesSql("hcorp")},
    cdf AS (SELECT h, COUNT(*) AS df FROM ch GROUP BY h),
    chr AS (SELECT ch.doc_id, ch.h FROM ch JOIN cdf USING (h)
            WHERE cdf.df <= $HotChunkDfCap),
    ${chunkPairTailSql("ch")}"""

  // ------------------------------------------------ clamped-chunker gate

  /** FastCDC-style chunk clamps for the gated clamped variant: expected
    * chunk ≈ [[ChunkDivisor]] bytes, lengths forced into
    * [divisor/2, 2·divisor]. */
  val ChunkMinLen: Int = ChunkDivisor / 2
  val ChunkMaxLen: Int = ChunkDivisor * 2

  /** [[mmChunkNearDup]] under the min/max-clamped chunker
    * ([[graft.functions.CdcChunkHash60sClamped]]) — the production
    * config for adversarial content (zero runs → 1-byte chunks,
    * divisor-avoiding bytes → payload-sized chunks; the clamps bound
    * both). Clamping makes the cut decision STATEFUL (each cut depends
    * on the previous one), so the oracle cannot state it positionally
    * like [[mmChunkNearDupSql]] — but the kernel's window deliberately
    * straddles cuts, so the divisor CANDIDATE set stays positional and
    * the cut walk over it is pure integer recursion
    * ([[mmChunkNearDupClampedSql]]); the kernel is additionally pinned
    * against an independent scalar Scala reference in `CdcChunkSpec`
    * (equality, clamp bounds, minLen=1/maxLen=∞ ≡ the stateless
    * rule). */
  def mmChunkNearDupClamped(spark: SparkSession, dir: String): DataFrame = {
    val corpus = chunkCorpus(spark, dir)
    val rows = graft.Caches.persist(corpus.select(col("doc_id"),
      explode(graft.functions.CdcChunkHash60sClamped.chunkHashes(
        col("text").cast("binary"), ChunkW, ChunkDivisor,
        ChunkMinLen, ChunkMaxLen)).as("h")))
    chunkPairTail(rows)
  }

  /** Oracle for the clamped chunker — the r15 stretch that retires this
    * gate from the rows-only tail: the divisor candidates are the SAME
    * positional list as the unclamped oracle's (the window straddles
    * cuts by design), and the clamp walk is a RECURSIVE integer
    * unfold — from cut position c, the next cut is the least of (first
    * candidate ≥ c + minLen, c + maxLen, end) — exactly the kernel's
    * first-rule-to-fire scan, stated as arithmetic over the candidate
    * set instead of per-byte state. Chunk hashing and the
    * shared/containment tail are the oracles' shared CTEs. */
  val mmChunkNearDupClampedSql: String = s"""
    WITH RECURSIVE $chunkCorpusCtesSql,
    ${chunkCandCteSql("mcorp")},
    cand AS (SELECT doc_id, unnest(cands) AS q FROM ce0),
    dlen AS (SELECT doc_id, length(text)::BIGINT AS len
             FROM mcorp WHERE length(text) > 0),
    walk AS (
      SELECT doc_id, 0::BIGINT AS cut FROM dlen
      UNION ALL
      SELECT w.doc_id,
             LEAST(
               COALESCE((SELECT MIN(c.q) FROM cand c
                         WHERE c.doc_id = w.doc_id
                           AND c.q >= w.cut + $ChunkMinLen), l.len),
               w.cut + $ChunkMaxLen, l.len) AS cut
      FROM walk w JOIN dlen l ON l.doc_id = w.doc_id
      WHERE w.cut < l.len),
    cc AS (
      SELECT w.doc_id, ce0.text, list_sort(list(w.cut)) AS ends
      FROM walk w JOIN ce0 ON ce0.doc_id = w.doc_id
      WHERE w.cut > 0 GROUP BY w.doc_id, ce0.text),
    ${chunkSliceHashCteSql("cc")},
    chr AS (SELECT doc_id, h FROM ch),
    ${chunkPairTailSql()}"""
}
