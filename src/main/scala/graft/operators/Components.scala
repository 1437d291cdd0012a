package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the cluster-resolution step
  * of a near-dup pipeline: LSH/SimHash emit PAIRS, but keeping one
  * document per duplicate GROUP needs the transitive closure (a~b, b~c
  * ⇒ keep one of {a,b,c}).
  *
  * Min-label propagation, Pregel-style: every node starts labeled with
  * itself; each round it adopts the minimum label among itself and its
  * neighbors; fixpoint = per-component minimum. Each round is one join
  * + one map-side-combined min-aggregation, so a round costs one keyed
  * shuffle of the EDGE list (not the corpus), and rounds are bounded by
  * the component diameter — near-dup clusters are shallow, so this
  * converges in a handful of rounds even at 100 TB. Labels converge to
  * the same fixpoint regardless of schedule, so the result is
  * deterministic and engine-independent (the oracle computes the same
  * closure with a recursive CTE).
  */
object Components {

  /** (node, label) for every node in `pairs`, label = min node id of its
    * component. `localCheckpoint` truncates the per-iteration lineage so
    * long chains don't accumulate (at cluster scale, use checkpoint with
    * a reliable dir instead); superseded rounds' checkpoint blocks are
    * reclaimed by the ContextCleaner once the previous round's frame is
    * dereferenced. Throws if the fixpoint is not reached within
    * `maxIter` rounds — a partial result would silently mis-cluster
    * (and diverge from the closure the oracle computes), which is worse
    * than failing loudly.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 25): DataFrame = {
    // checkpoint the pair list BEFORE symmetrizing — the two union
    // branches would otherwise evaluate the (possibly expensive)
    // upstream pair pipeline twice
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b")).localCheckpoint()
    val edges = p
      .unionAll(p.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("a").as("node"))
      .distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborLabels = edges
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .select(col("a").as("node"), col("label"))
      val next = labels.unionAll(neighborLabels)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      val changed = next
        .join(labels.select(col("node"), col("label").as("old")), "node")
        .filter(col("label") =!= col("old"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "a component's min-label eccentricity exceeds the cap; raise maxIter")
    labels
  }
}
