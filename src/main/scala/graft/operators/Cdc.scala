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

  /** Apply `changes` to `snapshot`. `changes` must carry the snapshot's
    * exact columns plus `seqCol` (per-key monotone version; ties are
    * caller error — CDC sources emit unique per-key sequence numbers) and
    * `opCol` ('I' | 'U' | 'D'). Inserts and updates are the same upsert
    * arm; 'D' winners drop the key. */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], seqCol: String = "_seq",
                     opCol: String = "_op"): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    val snapCols = snapshot.columns.toSeq
    require(!snapCols.contains(seqCol) && !snapCols.contains(opCol),
      s"snapshot must not already carry '$seqCol'/'$opCol'")
    require(changes.columns.toSet == snapCols.toSet + seqCol + opCol,
      s"changelog schema must be snapshot columns + $seqCol + $opCol; " +
        s"got ${changes.columns.toSeq}")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(snapCols.map(col): _*)
    val touched = latest.select(keyCols.map(col): _*)
    snapshot.join(touched, keyCols, "left_anti").unionByName(upserts)
  }

  /** Insert-key offset for the gated query's synthetic changelog — far
    * above any test-scale orderkey range so derived insert keys cannot
    * collide with live ones (the id-collision trap the probe-corpus
    * builder also guards against). */
  val InsertOffset = 10000000L

  /** Gated query: a deterministic changelog derived from `orders` itself
    * (updates at seq 1, second updates + deletes at seq 2, inserts under
    * offset keys), merged back into `orders`. Exercises every arm:
    * last-wins double updates (%20==3), delete-after-update (%10==7),
    * plain update (%10==3), insert (%10==9), untouched passthrough. */
  def cdcMergeOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
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
    val changes = upd1.unionByName(upd2).unionByName(dels).unionByName(ins)
    applyChangelog(o, changes, Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  val cdcMergeOrdersSql: String = s"""
    WITH changes AS (
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
      FROM orders WHERE o_orderkey % 10 = 9),
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
}
