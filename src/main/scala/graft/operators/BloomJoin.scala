package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.functions.BloomMightContainLong
import graft.sources.Tables

/** Bloom-filter semi-join reduction: prune a huge fact scan by a compact
  * membership sketch of the dim-side join keys BEFORE the join shuffles
  * the fact.
  *
  * The regime this targets sits between Spark's two built-ins: the dim's
  * ROWS are too big to broadcast-hash-join, but its KEY SET fits a Bloom
  * filter (10M keys at 1% fpp ≈ 11 MB — broadcastable when the rows are
  * not). Without the filter, a shuffled join moves every fact row —
  * including the overwhelming majority that match nothing — through the
  * exchange; with it, non-matching rows die at the scan, inside the same
  * whole-stage-codegen stage as the parquet reader, and only ~fpp of the
  * non-matching volume leaks through to the shuffle. False positives are
  * eliminated by the exact join that follows, so composing
  * [[pruneFactKeys]] under any equi-join is a pure optimization, never a
  * semantics change (exactly the argument behind Spark's own
  * `InjectRuntimeFilter`, which rewrites only what its heuristics
  * recognize — an explicit operator covers the plans they miss, e.g. a
  * pre-aggregated or multi-hop dim).
  *
  * The filter build is `DataFrame.stat.bloomFilter` — a distributed
  * tree-aggregate over the dim (each partition builds a partial filter,
  * partials OR together); only the fixed-size bitmap reaches the driver,
  * which re-broadcasts it. No key collect, no driver loop.
  */
object BloomJoin {

  /** [[pruneFactKeys]] with `expectedItems` derived from `dim.count()`.
    *
    * A pinned capacity is a scale landmine: a filter sized for 1M keys
    * holding 45M (sf100's filtered orders) saturates — every bit set,
    * fpp → 1 — and the prune silently degrades to a no-op (correct, but
    * paying a full dim pass for nothing). The count is one extra pass
    * over the DIM only (for an unfiltered parquet relation it is
    * answered from file footers without a data scan; for a filtered one
    * it is a pushed-filter scan of the small side) — trivially cheap
    * next to the fact-shuffle volume the correctly-sized prune removes,
    * and the same corpus-derived-constant posture as
    * [[Similarity.cosineNearDupAuto]]'s `autoPlanes`. */
  def pruneFactKeysAuto(fact: DataFrame, factKey: String,
                        dim: DataFrame, dimKey: String,
                        fpp: Double = 0.01): DataFrame =
    pruneFactKeys(fact, factKey, dim, dimKey,
      expectedItems = math.max(dim.count(), 1L), fpp = fpp)

  /** Fact rows whose `factKey` might be in `dim.dimKey` (integral keys).
    * `expectedItems`/`fpp` size the filter: bits ≈ -n·ln(fpp)/ln²2.
    * Prefer [[pruneFactKeysAuto]] unless the caller already knows the
    * key cardinality (e.g. from table stats) — an undersized filter
    * saturates and stops pruning. */
  def pruneFactKeys(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    expectedItems: Long, fpp: Double): DataFrame = {
    val kt = dim.schema(dimKey).dataType
    require(kt == LongType || kt == IntegerType,
      s"bloom prune supports integral keys, got $kt for $dimKey")
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    fact.filter(BloomMightContainLong.mightContain(
      col(factKey).cast("long"), bc))
  }

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Gated query: lineitem bloom-pruned by the keys of a filtered orders
    * relation, then exact-joined and aggregated. The oracle is the PLAIN
    * join — identical results prove the prune is transparent (false
    * positives die in the exact join). The dim filter keeps ~a third of
    * orders: selective enough that the prune pays, populated enough that
    * the bloom is exercised at every test scale. Auto-sized (the oracle
    * is capacity-independent, so nothing pins the constant): the filter
    * tracks the dim cardinality at any scale factor instead of
    * saturating past a pinned capacity. */
  def q30BloomPrejoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val fact = pruneFactKeysAuto(
      Tables.lineitem(spark, dir), "l_orderkey",
      dim, "o_orderkey", fpp = 0.01)
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("urgent_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag"))
  }

  val q30BloomPrejoinSql: String = """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS urgent_revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""
}
