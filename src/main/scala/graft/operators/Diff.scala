package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dataset snapshot diff — the regression gate every pipeline re-run
  * needs: given two versions of a keyed table, classify every key as
  * `added` / `removed` / `changed` / `unchanged`.
  *
  * Scale shape: each side is scanned ONCE and immediately projected to
  * (key, digest) — a 128-bit md5 over the compared columns — so the
  * full-outer join shuffles two narrow digest relations, never row
  * bodies, no matter how wide the table. Unchanged keys (the vast
  * majority of any incremental re-run) are dropped before output, so
  * the result scales with CHURN, not table size. When both versions are
  * written bucketed on the key ([[graft.sources.Bucketing]]) the join
  * plans Exchange-free — the diff of two 100 TB snapshots then reads
  * both once with zero shuffle.
  *
  * Digests are compared only WITHIN one engine run (status is the
  * output, not the digest), so cross-engine string-rendering drift of
  * e.g. doubles is harmless — each engine just has to be internally
  * consistent, which `cast(string)` is.
  *
  * Reference scope note: the reference engine has no diff/maintenance
  * surface (config-driven scan/validate/sink only,
  * `/root/reference/src/main/scala/com/pipeline/PipelineProcessor.scala`);
  * this belongs to the warehouse-maintenance extension pack next to
  * [[Cdc]] and [[Compaction]]. */
object Diff {

  /** Key offset for the synthetic v2's added rows (collision-free with
    * real order keys at any SF the driver generates). */
  val AddOffset = 10000000L

  /** Per-key diff of `v1` → `v2`. `keyCols` must identify a row in each
    * version; `compareCols` are the value columns whose change flips a
    * key to `changed` (pre-cast anything whose equality semantics need
    * pinning — e.g. floats to decimal). Null-safe and injection-safe:
    * every value digests as (null flag, length, value) — the flag keeps
    * an actual NULL from colliding with any string rendering, and the
    * length prefix makes the encoding prefix-free so embedded separator
    * characters cannot shift column boundaries into a collision. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keyCols: Seq[String],
      compareCols: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val dg = md5(concat_ws("|", compareCols.flatMap { c =>
      val s = coalesce(c.cast("string"), lit(""))
      Seq(when(c.isNull, lit("1")).otherwise(lit("0")),
        length(s).cast("string"), s)
    }: _*))
    val a = v1.select(keyCols.map(col) :+ dg.as("__d1"): _*)
    val b = v2.select(keyCols.map(col) :+ dg.as("__d2"): _*)
    a.join(b, keyCols, "full_outer")
      .withColumn("status",
        when(col("__d1").isNull, lit("added"))
          .when(col("__d2").isNull, lit("removed"))
          .when(col("__d1") =!= col("__d2"), lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__d1", "__d2")
  }

  /** Deterministic second version of `orders` for the gated query —
    * exercises every status: keys %13==0 vanish (`removed`), %7==1 flip
    * their status flag (`changed`), %11==0 reappear under [[AddOffset]]
    * (`added`), everything else passes through (`unchanged`). */
  def syntheticOrdersV2(o: DataFrame): DataFrame = {
    val base = o.filter(pmod(col("o_orderkey"), lit(13)) =!= 0)
      .withColumn("o_orderstatus",
        when(pmod(col("o_orderkey"), lit(7)) === 1, lit("X"))
          .otherwise(col("o_orderstatus")))
    val added = o.filter(pmod(col("o_orderkey"), lit(11)) === 0)
      .withColumn("o_orderkey", col("o_orderkey") + AddOffset)
    base.unionByName(added)
  }

  private val CompareCols =
    Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Gated query: diff orders against the synthetic v2, churn rows only. */
  def profDatasetDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    snapshotDiff(o, syntheticOrdersV2(o), Seq("o_orderkey"), CompareCols.map(col))
      .filter(col("status") =!= "unchanged")
      .select(col("o_orderkey"), col("status"))
      .orderBy(col("o_orderkey"), col("status"))
  }

  private val digestSql = "md5(concat_ws('|', " + CompareCols
    .map(c => s"CASE WHEN $c IS NULL THEN '1' ELSE '0' END, " +
      s"CAST(length(coalesce(CAST($c AS VARCHAR), '')) AS VARCHAR), " +
      s"coalesce(CAST($c AS VARCHAR), '')").mkString(", ") + "))"

  val profDatasetDiffSql: String = s"""
    WITH v2 AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 7 = 1 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + $AddOffset, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 11 = 0),
    d1 AS (SELECT o_orderkey, $digestSql AS dg FROM orders),
    d2 AS (SELECT o_orderkey, $digestSql AS dg FROM v2),
    j AS (
      SELECT COALESCE(d1.o_orderkey, d2.o_orderkey) AS o_orderkey,
             CASE WHEN d1.dg IS NULL THEN 'added'
                  WHEN d2.dg IS NULL THEN 'removed'
                  WHEN d1.dg <> d2.dg THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM d1 FULL OUTER JOIN d2 ON d1.o_orderkey = d2.o_orderkey)
    SELECT o_orderkey, status FROM j
    WHERE status <> 'unchanged'
    ORDER BY o_orderkey, status"""
}
