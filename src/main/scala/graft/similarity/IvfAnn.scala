package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{cosineQ, dotQ}

/** IVF (inverted-file) approximate nearest neighbour — the second
  * scale path next to [[Similarity.annLsh]] (SURVEY.md §2.4/29).
  *
  * Build: k deterministic seed vectors → `iters` Lloyd passes
  * (assign to nearest centroid, element-wise mean rebuild) →
  * per-centroid inverted lists.
  * Probe: each query scores the (tiny, broadcast) centroid table,
  * keeps `nprobe` nearest cells, and runs exact cosine only against
  * those cells' lists — corpus work drops from O(N) to
  * O(N · nprobe / k) per query, the standard IVF trade.
  *
  * Tuning guidance (backed by IvfRecallSpec): recall@k rises
  * monotonically with `nprobe` and reaches 1.0 (bit-identical to
  * brute force) at nprobe = numCentroids; extra Lloyd passes tighten
  * cells so the same nprobe covers more true neighbours. At corpus
  * scale pick numCentroids ≈ √N and nprobe for the recall target —
  * per-query work is N·nprobe/numCentroids regardless.
  *
  * All vector math is the quantized integer kind (bit-stable), and
  * centroid construction is fully declarative: posexplode → groupBy
  * (cell, dim) mean → rebuild arrays with sort_array(collect_list).
  */
object IvfAnn {

  /** numCentroids ≈ √N — the standard IVF coarse-quantizer sizing
    * (per-query work N·nprobe/numCentroids balances against the
    * nprobe·(N/cells) scan of probed cells at cells = √N). Clamped to
    * [1, 2^16]; pass the result to [[annIvf]] explicitly so the
    * corpus count (an action) stays a caller-side decision. */
  def suggestCentroids(corpusSize: Long): Int = {
    require(corpusSize >= 0)
    math.max(1L, math.min(1L << 16, math.round(math.sqrt(corpusSize.toDouble)))).toInt
  }

  /** Assign every corpus vector to its nearest centroid (max cosine,
    * deterministic tie-break on centroid id). Centroids are tiny →
    * broadcast cross join, no corpus shuffle. `carry` names extra
    * corpus columns to ride THROUGH the top-1 heap (the Lloyd rebuild
    * discipline): a caller that needs per-vector payload next to the
    * assignment (e.g. PQ codes for the inverted lists) gets it in the
    * same corpus pass instead of re-joining on vec_id afterwards —
    * two exchanges and a sort saved (guide §2.4). */
  def assign(corpus: DataFrame, cents: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(cents))
      .withColumn("__cos", cosineQ(dotQ(col("e"), col("ce")), col("nrm"), col("cnrm")))
      // explicit projection: GroupTopK is a custom operator Catalyst
      // cannot prune columns through, so without this the partial heap
      // and its exchange carry the vector AND the centroid vector per
      // scored row (guide §2.3: project before the exchange)
      .select(col("vec_id") +: carry.map(col) :+ col("c_id") :+ col("__cos"): _*)
    // top-1 per vector via the custom GroupTopK operator: the partial
    // phase reduces each vector to one row per input partition before
    // any shuffle (window rank would shuffle+sort corpus × centroids)
    org.apache.spark.sql.graft.GraftPlans
      .groupTopK(scored, Seq(col("vec_id")), Seq(col("__cos").desc, col("c_id").asc), 1)
      .select(col("vec_id") +: carry.map(col) :+ col("c_id"): _*)
  }

  /** K centroids: deterministic seeds (k smallest vec_ids with a
    * non-zero norm), `iters` Lloyd passes, element-wise integer-mean
    * rebuild. Every round drops degenerate all-zero-mean centroids
    * (cnrm = 0 would divide by zero in the cosine — Spark would yield
    * NaN, DuckDB engine-dependent NULL; the guard keeps both engines
    * out of that corner). Each round's centroid table is tiny and is
    * local-checkpointed so round n+1's plan does not re-derive round
    * n's whole assignment lineage. */
  def centroids(corpus: DataFrame, k: Int, iters: Int = 1): DataFrame = {
    require(iters >= 1)
    val seeds = corpus
      .filter(col("nrm") > 0)
      .orderBy("vec_id")
      .limit(k)
      .select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cnrm"))
    var lastCk: DataFrame = null
    (1 to iters).foldLeft(seeds) { (cents, i) =>
      // Lloyd rebuild, vector carried THROUGH the top-1 so the round
      // needs no assignment⋈corpus re-join (previously a corpus-sized
      // sort-merge join — two exchanges and a sort — per round; the
      // top-1 heap row grows by one vector, which the join shuffled
      // anyway). Same argmin, same floor-mean: bit-identical rounds.
      val scored = corpus
        .crossJoin(broadcast(cents))
        .withColumn("__cos", cosineQ(dotQ(col("e"), col("ce")), col("nrm"), col("cnrm")))
        .select(col("vec_id"), col("e"), col("c_id"), col("__cos"))
      val assigned = org.apache.spark.sql.graft.GraftPlans
        .groupTopK(scored, Seq(col("vec_id")), Seq(col("__cos").desc, col("c_id").asc), 1)
      val exploded = assigned
        .select(col("c_id"), posexplode(col("e")).as(Seq("i", "v")))
      // floor(double-division) rather than a long cast: floor is the one
      // integral-mean formulation DuckDB and Spark agree on bit-for-bit
      // (CAST truncates toward zero in Spark but rounds in DuckDB)
      val meanPerDim = exploded
        .groupBy("c_id", "i")
        .agg(floor(sum(col("v")).cast("double") / count(lit(1))).as("m"))
      val rebuilt = meanPerDim
        .groupBy("c_id")
        .agg(transform(sort_array(collect_list(struct(col("i"), col("m")))), s => s.getField("m")).as("ce"))
        .withColumn("cnrm", dotQ(col("ce"), col("ce")))
        .filter(col("cnrm") > 0)
      // lineage cut every 4th round and at the end (the Bpe.trainMerges
      // cadence): a per-round eager checkpoint paid a driver-synchronous
      // job per round, and at the 2-iteration gate dials that was the
      // bulk of the build's job count (§1.2 — these queries are
      // job-floor-bound at sf0.1, 48–51 jobs for <11 MB shuffled);
      // intermediate rounds stack lazily into the next round's
      // broadcast build instead
      // a superseded checkpoint is released only once the NEXT one is
      // materialized — an intermediate lazy round still reads the last
      // checkpoint's blocks, so the per-round release broke at
      // iters > 4
      if (i == iters || i % 4 == 0) {
        val next = graft.operators.Checkpoints.eager(rebuilt)
        if (lastCk != null && (lastCk ne next)) graft.operators.Checkpoints.release(lastCk)
        lastCk = next
        next
      } else rebuilt
    }
  }

  /** ANN top-k: probe the `nprobe` nearest cells per query, exact
    * cosine within those cells only. */
  def annIvf(corpus: DataFrame, queries: DataFrame, k: Int, numCentroids: Int, nprobe: Int,
      lloydIters: Int = 1): DataFrame = {
    // the (numCentroids-row) centroid table is materialized by the
    // loop-internal checkpoint in `centroids`: it feeds both the
    // inverted-list assignment and the query probe, and its lineage is
    // the whole Lloyd pass — recomputing that per consumer branch
    // doubles the pipeline
    val cents = centroids(corpus, numCentroids, lloydIters)
    // inverted lists: c_id -> members. Vectors ride THROUGH the top-1
    // heap (carry) in the same corpus pass as the assignment — the
    // previous assign ⋈ corpus join on vec_id paid two exchanges and a
    // sort for a 1:1 self-alignment (guide §2.4)
    val lists = assign(corpus, cents, carry = Seq("e", "nrm"))
    val qs = queries.select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qnrm"))
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("__ccos").desc, col("c_id").asc)
    val probed = qs
      .crossJoin(broadcast(cents))
      .withColumn("__ccos", cosineQ(dotQ(col("qe"), col("ce")), col("qnrm"), col("cnrm")))
      .withColumn("__crn", row_number().over(probeW))
      .filter(col("__crn") <= nprobe)
      .select(col("q_id"), col("qe"), col("qnrm"), col("c_id"))
    val cand = probed
      .join(lists, "c_id")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", cosineQ(dotQ(col("qe"), col("e")), col("qnrm"), col("nrm")))
    Similarity.rankedTopK(cand, col("q_id"), Seq(col("cos").desc, col("vec_id").asc), k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
  }
}
