package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** CDC changelog application — maintain a big snapshot under a stream of
  * keyed Insert/Update/Delete changes (the MERGE INTO of a warehouse, the
  * compaction step of every incremental ingest).
  *
  * The reference engine has no incremental story (its pipeline re-reads
  * whole inputs per run, `PipelineProcessor.scala:111`); at 100 TB a full
  * re-ingest per batch is the difference between minutes and days, so the
  * engine ships the standard two-step merge:
  *
  *   1. collapse the changelog to ONE winner per key — `row_number` over
  *      the per-key sequence descending (CDC feeds carry a per-key
  *      monotone LSN/offset);
  *   2. snapshot rows whose key is untouched survive via LEFT ANTI join;
  *      winners that are not deletes are unioned in.
  *
  * Scale shape: the window shuffles only the CHANGELOG (GBs) on key; the
  * snapshot (TBs) is never shuffled — the anti join's build side is the
  * tiny touched-key set, which AQE plans as a broadcast, so the merge is
  * one changelog shuffle plus one snapshot scan. This is why the merge is
  * NOT a full outer join of snapshot × changes (which would shuffle the
  * snapshot on key every batch).
  */
object Cdc {

  private def requireChangelogShape(snapshot: DataFrame, changes: DataFrame,
                                    keyCols: Seq[String], seqCol: String,
                                    opCol: String): Unit = {
    require(keyCols.nonEmpty, "changelog application needs at least one key column")
    val snapCols = snapshot.columns.toSeq
    require(!snapCols.contains(seqCol) && !snapCols.contains(opCol),
      s"snapshot must not already carry '$seqCol'/'$opCol'")
    require(changes.columns.toSet == snapCols.toSet + seqCol + opCol,
      s"changelog schema must be snapshot columns + $seqCol + $opCol; " +
        s"got ${changes.columns.toSeq}")
  }

  /** Strict-mode tie check: a changelog with two rows at the same
    * (key, seq) has no defined winner — `row_number` over the tied sort
    * picks one nondeterministically. One aggregate pass over the
    * CHANGELOG only (the small side); the example key in the error makes
    * the upstream extractor bug triageable. */
  def requireNoSeqTies(changes: DataFrame, keyCols: Seq[String],
                       seqCol: String): Unit = {
    val gb = (keyCols :+ seqCol).map(col)
    val tied = changes.groupBy(gb: _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(tied.isEmpty,
      s"changelog has tied (${keyCols.mkString(",")}, $seqCol) rows, e.g. " +
        s"${tied.headOption.fold("")(_.toString)} — CDC sources must emit " +
        "unique per-key sequence numbers")
  }

  /** Apply `changes` to `snapshot`. `changes` must carry the snapshot's
    * exact columns plus `seqCol` (per-key monotone version) and `opCol`
    * ('I' | 'U' | 'D'). Inserts and updates are the same upsert arm; 'D'
    * winners drop the key. Ties on (key, seq) are caller error — CDC
    * sources emit unique per-key sequence numbers; `strict = true` spends
    * one extra changelog-side aggregate to fail loudly on them instead of
    * picking a nondeterministic winner. */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], seqCol: String = "_seq",
                     opCol: String = "_op", strict: Boolean = false): DataFrame = {
    requireChangelogShape(snapshot, changes, keyCols, seqCol, opCol)
    if (strict) requireNoSeqTies(changes, keyCols, seqCol)
    val snapCols = snapshot.columns.toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(snapCols.map(col): _*)
    val touched = latest.select(keyCols.map(col): _*)
    snapshot.join(touched, keyCols, "left_anti").unionByName(upserts)
  }

  /** SCD-type-2 (history-keeping) changelog application — the warehouse
    * twin of [[applyChangelog]]: instead of the current snapshot it
    * returns EVERY version with validity bounds, so point-in-time queries
    * ("what did this row say at seq s?") stay answerable after the merge.
    *
    * Output = snapshot columns + `valid_from` (seq that produced the
    * version; null for pre-changelog snapshot rows), `valid_to` (seq of
    * the change that superseded it; null = still open) and `is_current`.
    * A 'D' change emits no version of its own — it closes its
    * predecessor (its seq becomes that row's `valid_to`), so a key whose
    * last change is a delete has history but no current row.
    *
    * Scale shape is the same two-step as [[applyChangelog]]: the window
    * (`lead` over per-key seq) shuffles only the CHANGELOG; the snapshot
    * is never shuffled — it left-joins the tiny per-key first-seq
    * relation (AQE plans the broadcast) just to learn which of its rows
    * got closed and when. */
  def applyChangelogScd2(snapshot: DataFrame, changes: DataFrame,
                         keyCols: Seq[String], seqCol: String = "_seq",
                         opCol: String = "_op", strict: Boolean = false): DataFrame = {
    requireChangelogShape(snapshot, changes, keyCols, seqCol, opCol)
    require(!snapshot.columns.exists(Set("valid_from", "valid_to", "is_current")),
      "snapshot must not already carry valid_from/valid_to/is_current")
    if (strict) requireNoSeqTies(changes, keyCols, seqCol)
    val snapCols = snapshot.columns.toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    val fromChanges = changes
      .withColumn("__next_seq", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .select(snapCols.map(col) ++ Seq(
        col(seqCol).cast("long").as("valid_from"),
        col("__next_seq").cast("long").as("valid_to"),
        col("__next_seq").isNull.as("is_current")): _*)
    val firstSeq = changes.groupBy(keyCols.map(col): _*)
      .agg(min(col(seqCol)).cast("long").as("__first_seq"))
    val fromSnapshot = snapshot.join(firstSeq, keyCols, "left")
      .select(snapCols.map(col) ++ Seq(
        lit(null).cast("long").as("valid_from"),
        col("__first_seq").as("valid_to"),
        col("__first_seq").isNull.as("is_current")): _*)
    fromSnapshot.unionByName(fromChanges)
  }

  /** Incremental [[applyChangelogScd2]]: fold one changelog SLICE into
    * an existing history table (the output shape of
    * `applyChangelogScd2` itself, so folds chain). Under the CDC topic
    * contract (every seq in `changes` is greater than every seq already
    * folded), chaining slice folds is provably identical to the
    * one-shot merge: a version left open by an earlier slice gets its
    * `valid_to` from the key's FIRST seq in the later slice — exactly
    * the `lead` the one-shot window would have seen across the slice
    * boundary; versions closed within a slice close by the in-slice
    * lead either way.
    *
    * Scale shape: the window shuffles only the incoming slice; the
    * history side left-joins the tiny per-key first-seq relation
    * (broadcast under AQE) to learn which OPEN rows to close — closed
    * history rows pass through untouched, never shuffled. */
  def applyChangelogScd2Delta(history: DataFrame, changes: DataFrame,
                              keyCols: Seq[String], seqCol: String = "_seq",
                              opCol: String = "_op",
                              strict: Boolean = false): DataFrame = {
    val histCols = Set("valid_from", "valid_to", "is_current")
    require(histCols.subsetOf(history.columns.toSet),
      "history must be applyChangelogScd2 output (valid_from/valid_to/is_current)")
    if (strict) requireNoSeqTies(changes, keyCols, seqCol)
    val snapCols = history.columns.toSeq.filterNot(histCols)
    require(changes.columns.toSet == snapCols.toSet + seqCol + opCol,
      s"changelog schema must be history data columns + $seqCol + $opCol")
    val firstSeq = changes.groupBy(keyCols.map(col): _*)
      .agg(min(col(seqCol)).cast("long").as("__first_seq"))
    val closed = history.join(firstSeq, keyCols, "left")
      .select(snapCols.map(col) ++ Seq(
        col("valid_from"),
        when(col("is_current") && col("__first_seq").isNotNull, col("__first_seq"))
          .otherwise(col("valid_to")).as("valid_to"),
        (col("is_current") && col("__first_seq").isNull).as("is_current")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    val fresh = changes
      .withColumn("__next_seq", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .select(snapCols.map(col) ++ Seq(
        col(seqCol).cast("long").as("valid_from"),
        col("__next_seq").cast("long").as("valid_to"),
        col("__next_seq").isNull.as("is_current")): _*)
    closed.unionByName(fresh)
  }

  /** Insert-key offset for the gated query's synthetic changelog — far
    * above any test-scale orderkey range so derived insert keys cannot
    * collide with live ones (the id-collision trap the probe-corpus
    * builder also guards against). */
  val InsertOffset = 10000000L

  /** Deterministic changelog derived from `orders` itself (updates at
    * seq 1, second updates + deletes at seq 2, inserts under offset
    * keys) — shared by the merge and SCD2 gated queries. Exercises every
    * arm: last-wins double updates (%20==3), delete-after-update
    * (%10==7), plain update (%10==3), insert (%10==9), untouched
    * passthrough. */
  def syntheticOrdersChangelog(o: DataFrame): DataFrame = {
    val upd1 = o.filter(pmod(col("o_orderkey"), lit(10)).isin(3L, 7L))
      .withColumn("o_orderstatus", lit("U1"))
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      .withColumn("_seq", lit(1L)).withColumn("_op", lit("U"))
    val upd2 = o.filter(pmod(col("o_orderkey"), lit(20)) === 3)
      .withColumn("o_orderstatus", lit("U2"))
      .withColumn("o_totalprice", col("o_totalprice") * 1.2)
      .withColumn("_seq", lit(2L)).withColumn("_op", lit("U"))
    val dels = o.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      .withColumn("_seq", lit(2L)).withColumn("_op", lit("D"))
    val ins = o.filter(pmod(col("o_orderkey"), lit(10)) === 9)
      .withColumn("o_orderkey", col("o_orderkey") + InsertOffset)
      .withColumn("o_orderstatus", lit("N"))
      .withColumn("_seq", lit(1L)).withColumn("_op", lit("I"))
    upd1.unionByName(upd2).unionByName(dels).unionByName(ins)
  }

  /** Gated query: the synthetic changelog merged back into `orders`. */
  def cdcMergeOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    applyChangelog(o, syntheticOrdersChangelog(o), Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** Gated query: the same synthetic changelog applied SCD2-style —
    * full version history with validity bounds. `strict = true` so the
    * tie check runs inside the gate (the synthetic changelog is
    * tie-free by construction: seq 1 and seq 2 partitions touch
    * disjoint op sets per key). */
  def cdcScd2Orders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    applyChangelogScd2(o, syntheticOrdersChangelog(o), Seq("o_orderkey"),
        strict = true)
      .orderBy(col("o_orderkey"), col("valid_from"))
  }

  /** Travel seq for the gated point-in-time query. */
  val TravelSeq = 1L

  /** Point-in-time reconstruction off the SCD2 history — the query the
    * history table exists to answer: the snapshot AS OF seq s is every
    * version whose validity interval covers s
    * (`valid_from ≤ s < valid_to`, null bounds open). Gated hash-exact
    * against an INDEPENDENT derivation: [[applyChangelog]] semantics
    * over the changelog truncated at s — time travel through intervals
    * must equal replaying only the prefix. One narrow filter over the
    * history, no shuffle beyond the history build itself. */
  def cdcTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val hist = applyChangelogScd2(o, syntheticOrdersChangelog(o), Seq("o_orderkey"))
    hist.filter(
        (col("valid_from").isNull || col("valid_from") <= TravelSeq) &&
        (col("valid_to").isNull || col("valid_to") > TravelSeq))
      .select(o.columns.map(col): _*)
      .orderBy(col("o_orderkey"))
  }

  /** The synthetic changelog as a DuckDB CTE — shared by both oracles so
    * the SCD2 gate provably exercises the same change stream. */
  private val changesCteSql: String = s"""changes AS (
      SELECT o_orderkey, o_custkey, 'U1' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority,
             1 AS _seq, 'U' AS _op
      FROM orders WHERE o_orderkey % 10 IN (3, 7)
      UNION ALL
      SELECT o_orderkey, o_custkey, 'U2', o_totalprice * 1.2,
             o_orderdate, o_orderpriority, 2, 'U'
      FROM orders WHERE o_orderkey % 20 = 3
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, 2, 'D'
      FROM orders WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey + $InsertOffset, o_custkey, 'N', o_totalprice,
             o_orderdate, o_orderpriority, 1, 'I'
      FROM orders WHERE o_orderkey % 10 = 9)"""

  val cdcMergeOrdersSql: String = s"""
    WITH $changesCteSql,
    latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY _seq DESC) AS rn
        FROM changes) WHERE rn = 1)
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM latest WHERE _op <> 'D'
    ORDER BY o_orderkey"""

  val cdcScd2OrdersSql: String = s"""
    WITH $changesCteSql,
    seqd AS (
      SELECT *, lead(_seq) OVER (PARTITION BY o_orderkey ORDER BY _seq) AS next_seq
      FROM changes),
    first_seq AS (
      SELECT o_orderkey, CAST(MIN(_seq) AS BIGINT) AS fs
      FROM changes GROUP BY o_orderkey)
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
           o.o_orderdate, o.o_orderpriority,
           CAST(NULL AS BIGINT) AS valid_from, f.fs AS valid_to,
           f.fs IS NULL AS is_current
    FROM orders o LEFT JOIN first_seq f USING (o_orderkey)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority,
           CAST(_seq AS BIGINT) AS valid_from, CAST(next_seq AS BIGINT) AS valid_to,
           next_seq IS NULL AS is_current
    FROM seqd WHERE _op <> 'D'
    ORDER BY o_orderkey, valid_from"""

  /** Oracle for [[cdcTimeTravel]] — deliberately NOT derived from the
    * SCD2 CTEs: it replays the truncated changelog through the merge
    * semantics instead, so the gate cross-checks the two formulations
    * against each other. */
  val cdcTimeTravelSql: String = s"""
    WITH $changesCteSql,
    prefix AS (SELECT * FROM changes WHERE _seq <= $TravelSeq),
    latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY _seq DESC) AS rn
        FROM prefix) WHERE rn = 1)
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM latest WHERE _op <> 'D'
    ORDER BY o_orderkey"""
}
