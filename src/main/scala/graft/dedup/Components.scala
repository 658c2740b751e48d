package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints

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
  * an eager checkpoint truncates the iterative lineage so the plan
  * doesn't grow with rounds. Superseded rounds' blocks are released
  * immediately; the final one at the caller's next
  * [[graft.operators.Checkpoints.releaseAll]].
  */
object Components {

  /** (id, cluster_id) for every node in `pairs`; cluster_id = min
    * node id of the component. Deterministic. */
  def connectedComponents(pairs: DataFrame, a: String, b: String, maxIter: Int = 20): DataFrame = {
    val sym = Checkpoints.eager(pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst"))))
    var labels = Checkpoints.eager(sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")))
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .select(col("src").as("id"), col("lbl"))
      val next = Checkpoints.eager(labels.unionByName(nbrMin)
        .groupBy("id").agg(min("lbl").as("lbl")))
      // any graph with an edge needs ≥2 rounds — skip the convergence
      // job until it could plausibly fire
      val changed =
        if (round < 1) 1L
        else next.as("n")
          .join(labels.as("o"), "id")
          .filter(col("n.lbl") =!= col("o.lbl"))
          .count()
      Checkpoints.release(labels) // superseded: `next` is materialized
      labels = next
      converged = changed == 0
      round += 1
    }
    Checkpoints.release(sym) // final labels are self-contained blocks
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Connected components via alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14 — public paper). Same contract as
    * [[connectedComponents]] but converges in O(log²) rounds on
    * adversarial long-chain / high-diameter graphs where plain
    * min-label propagation needs diameter rounds.
    *
    * Both star steps are expressed as join+groupBy (one shuffle each)
    * rather than collect_list, so a single high-degree hub node never
    * materializes its whole neighborhood in one task. Convergence is
    * detected by an order-independent (count, sum-of-xxhash64) edge-set
    * signature — one cheap aggregate per round.
    */
  def connectedComponentsStar(pairs: DataFrame, a: String, b: String, maxIter: Int = 30): DataFrame = {
    val nodes = Checkpoints.eager(
      pairs.select(col(a).as("id")).union(pairs.select(col(b).as("id"))).distinct())
    // orient (u > v) and dedup; self-loops drop out
    var e = Checkpoints.eager(
      pairs.select(greatest(col(a), col(b)).as("u"), least(col(a), col(b)).as("v"))
        .filter(col("u") =!= col("v")).distinct())

    // large-star(s): attach every neighbor d > s to m = min(Γ(s) ∪ {s})
    def largeStar(edges: DataFrame): DataFrame = {
      val sym = edges.select(col("u").as("s"), col("v").as("d"))
        .union(edges.select(col("v").as("s"), col("u").as("d")))
      val mins = sym.groupBy("s").agg(min("d").as("mn"))
        .select(col("s"), least(col("mn"), col("s")).as("m"))
      // no distinct here: duplicates only thicken the next smallStar's
      // groupBy input and its terminal distinct canonicalizes — one
      // fewer shuffle per round
      sym.join(mins, "s").filter(col("d") > col("s"))
        .select(col("d").as("u"), col("m").as("v")) // d > s >= m: stays oriented
    }

    // small-star(u): attach every smaller neighbor (and u itself) to
    // m = min of u's smaller neighborhood. Input must be oriented u > v.
    def smallStar(edges: DataFrame): DataFrame = {
      val mins = edges.groupBy("u").agg(min("v").as("m"))
      edges.join(mins, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .distinct()
    }

    // order-independent edge-set signature; bit_xor never overflows
    // (ANSI sum over hashes would)
    def signature(edges: DataFrame): (Long, Long) = {
      val r = edges.agg(count(lit(1)), call_function("bit_xor", xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // NB: the round-0 signature looks skippable, but near-dup pair
    // graphs are mostly 2-cliques, which are star-stable immediately —
    // sig0 lets the loop converge after ONE contraction; skipping it
    // would buy one cheap aggregate at the price of a second 2-shuffle
    // contraction round in the common case
    var prev = signature(e)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val eNext = Checkpoints.eager(smallStar(largeStar(e)))
      val cur = signature(eNext)
      Checkpoints.release(e) // superseded round
      e = eNext
      converged = cur == prev
      prev = cur
      round += 1
    }
    // converged: a star per component, every non-root points at the root
    val roots = e.groupBy("u").agg(min("v").as("lbl")).select(col("u").as("id"), col("lbl"))
    nodes.join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("cluster_id"))
  }

  /** Full dedup decision: every doc keeps exactly one representative —
    * the min id of its near-dup cluster (docs without any near-dup
    * keep themselves). Left join: singleton docs pass through. */
  def keepOnePerCluster(df: DataFrame, id: Column, pairs: DataFrame, a: String, b: String): DataFrame = {
    // reserved names: drop-by-name removes EVERY column with that name,
    // so joining under the caller-visible "id"/"cluster_id" would
    // silently delete a caller's same-named column
    val comps = connectedComponents(pairs, a, b)
      .select(col("id").as("__cc_id"), col("cluster_id").as("__cc_cluster"))
    df.join(comps, id === col("__cc_id"), "left")
      .withColumn("__cc_rep", coalesce(col("__cc_cluster"), id))
      .drop("__cc_id", "__cc_cluster")
      .filter(id === col("__cc_rep"))
      .drop("__cc_rep")
  }

  /** Quality-aware keep rule: per near-dup cluster keep the row that
    * ranks FIRST under `order` (e.g. highest quality score, longest
    * text — give it a total order with an id tiebreak, or the keeper
    * is nondeterministic). The min-id rule of [[keepOnePerCluster]]
    * throws away a long clean document because a stub with a smaller
    * id near-matched it; ranking by quality keeps the copy worth
    * training on. Singletons pass through untouched.
    *
    * Selection runs through the GroupTopK operator (k = 1): each map
    * partition reduces to one candidate per cluster BEFORE the
    * exchange, so the shuffle carries one row per (cluster,
    * partition) — not the corpus. */
  def keepBestPerCluster(df: DataFrame, id: Column, pairs: DataFrame, a: String, b: String,
      order: Seq[Column]): DataFrame = {
    val comps = connectedComponents(pairs, a, b)
      .select(col("id").as("__cc_id"), col("cluster_id").as("__cc_cluster"))
    val labeled = df.join(comps, id === col("__cc_id"), "left")
      .withColumn("__cluster", coalesce(col("__cc_cluster"), id))
      .drop("__cc_id", "__cc_cluster")
    org.apache.spark.sql.graft.GraftPlans
      .groupTopK(labeled, Seq(col("__cluster")), order, 1)
      .drop("__cluster")
  }
}
