package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair graphs — the step
  * that turns pairwise dedup candidates into "keep one per cluster"
  * decisions (SURVEY.md §2.3).
  *
  * Min-label propagation: every node starts labeled with its own id;
  * each round takes the min of its label and its neighbors' labels;
  * fixpoint = min id of the component. Rounds needed = graph
  * diameter. Near-dup graphs are overwhelmingly tiny cliques (that is
  * the point of dedup), so convergence is fast; for adversarial
  * long-chain graphs the large-star/small-star contraction family
  * halves the diameter per round and would slot into the same loop.
  *
  * Each round is one shuffle (join on node id + min-aggregate);
  * `localCheckpoint` truncates the iterative lineage so the plan
  * doesn't grow with rounds.
  */
object Components {

  /** (id, cluster_id) for every node in `pairs`; cluster_id = min
    * node id of the component. Deterministic. */
  def connectedComponents(pairs: DataFrame, a: String, b: String, maxIter: Int = 20): DataFrame = {
    val sym = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .select(col("src").as("id"), col("lbl"))
      val next = labels.unionByName(nbrMin)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      // any graph with an edge needs ≥2 rounds — skip the convergence
      // job until it could plausibly fire
      val changed =
        if (round < 1) 1L
        else next.as("n")
          .join(labels.as("o"), "id")
          .filter(col("n.lbl") =!= col("o.lbl"))
          .count()
      labels = next
      converged = changed == 0
      round += 1
    }
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Full dedup decision: every doc keeps exactly one representative —
    * the min id of its near-dup cluster (docs without any near-dup
    * keep themselves). Left join: singleton docs pass through. */
  def keepOnePerCluster(df: DataFrame, id: Column, pairs: DataFrame, a: String, b: String): DataFrame = {
    val comps = connectedComponents(pairs, a, b)
    df.join(comps, id === comps("id"), "left")
      .withColumn("representative", coalesce(col("cluster_id"), id))
      .drop("id", "cluster_id")
      .filter(id === col("representative"))
      .drop("representative")
  }
}
