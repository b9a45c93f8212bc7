package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over near-dup pair relations — the step a
  * production dedup pipeline runs AFTER pair generation: verified pairs
  * (a,b) are edges, a duplicate group is a connected component, and the
  * pipeline keeps one representative per component. Pairs alone
  * under-delete: with docs {a,b,c} where (a,b) and (b,c) are near-dups
  * but (a,c) is not, pair-wise "drop the larger id" keeps {a,c} or
  * worse depending on order — component-wise keeps exactly one.
  *
  * Reference scope note: the reference engine
  * (`/root/reference/src/main/scala/com/pipeline/PipelineProcessor.scala:44-87`)
  * has no dedup at all; this is part of the driver-mandated
  * training-data extension surface.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with its own id; each round every vertex takes the min of
  * its own label and its neighbors' labels; fixpoint = every vertex
  * labeled with the min id of its component. Each round is ONE shuffle
  * (edge⋈label + groupBy-min) and the number of rounds is the graph
  * diameter. Near-dup graphs are short and fat (copies of a common
  * ancestor — stars and small cliques), so the diameter is small; for
  * adversarial long-chain graphs at 100 TB the drop-in upgrade is the
  * large-star/small-star algorithm (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14), which contracts
  * chains in O(log²) rounds with the same per-round shuffle shape.
  * Convergence is detected by the label-sum invariant: propagation only
  * ever DECREASES labels, so the sum of labels strictly decreases until
  * fixpoint — one cheap aggregate per round, no extra join.
  *
  * Every round ends in an EAGER `localCheckpoint`: an iterative plan
  * that unions/joins the previous round's frame embeds that plan TWICE
  * per round, so lineage grows exponentially and analysis alone OOMs
  * the driver near diameter 12. Checkpointing materializes the round
  * and restarts lineage from a leaf, keeping every round's plan
  * constant-size. On a cluster with executor loss a reliable
  * `checkpoint()` (HDFS dir) is the drop-in durable variant; local
  * checkpoint is the right default for a deterministic batch job that
  * simply reruns on failure. */
object Cluster {

  /** Hard round cap — `require`-failed rather than silently returning
    * unconverged labels (fail-loudly convention). Sum-based convergence
    * needs diameter+1 observations (one extra round to SEE the fixed
    * sum), so 64 rounds covers chains up to diameter 63 — far beyond
    * any real near-dup graph. */
  val MaxRounds = 64

  /** (id, cluster_id) for every vertex of `edges` (columns src, dst);
    * cluster_id = min vertex id of the component. Both endpoints of
    * every edge appear; isolated docs (no pair) are not vertices.
    *
    * The convergence loop is a DRIVER loop over aggregate scalars (one
    * sum per round), never over rows — labels stay distributed
    * throughout. The label sum is computed in decimal(38,0): ids can be
    * 60-bit hashes, and a Long sum that wrapped could fake a fixpoint.
    * Checkpoint blocks from earlier rounds are reclaimed by Spark's
    * ContextCleaner once the round's frame goes out of scope; the
    * returned frame is already materialized, so callers need no extra
    * persist. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    // Lazy checkpoints: labelSum is the action that materializes each
    // round's blocks, so a round costs ONE job (compute + cache + sum)
    // instead of an eager-checkpoint job plus the aggregate.
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint(false)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)")))
        .head().getDecimal(0)
    var prevSum = labelSum(labels)
    // empty edge set (a clean corpus is legal input): sum over zero rows
    // is null — return the empty label frame instead of NPE-ing below
    if (prevSum == null) return labels
    var rounds = 0
    var converged = false
    while (!converged) {
      require(rounds < MaxRounds,
        s"connectedComponents did not converge in $MaxRounds rounds")
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("cluster_id"))
      val next = labels.select(col("id"), col("cluster_id")).union(prop)
        .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint(false)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      rounds += 1
    }
    labels
  }
}
