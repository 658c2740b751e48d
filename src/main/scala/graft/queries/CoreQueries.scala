package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CoreOps._
import graft.functions.Hashing
import graft.sources.Tables

/** SURVEY.md §2.1 — shmr-core operator queries + DuckDB oracles. */
object CoreQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1/1 partition.map — per-record projection (fused into the scan).
    "q_map" -> ((s, dir) =>
      Tables.lineitem(s, dir).mapRecords(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue")
      )),

    // §2.1/2 partition.flat_map — explode words of p_type.
    "q_flat_map" -> ((s, dir) =>
      Tables.part(s, dir)
        .flatMapRecords(split(col("p_type"), " "), "word", col("p_partkey"))),

    // §2.1/3 partition.filter — predicate pushed to the parquet scan.
    "q_filter" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filterRecords(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .mapRecords(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    // §2.1/4 partition.distinct on a projection.
    "q_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir).distinctRecords(col("l_returnflag"), col("l_linestatus"))),

    // §2.1/4b partition.distinct(key_fn) keeping the whole record —
    // deterministic representative (min c_custkey) per nation.
    "q_distinct_by" -> ((s, dir) =>
      Tables.customer(s, dir)
        .distinctBy(Seq(col("c_nationkey")), Seq(col("c_custkey")))),

    // §2.1/5 partitions.reduce — global fold to one row.
    "q_reduce" -> ((s, dir) =>
      Tables.lineitem(s, dir).reduceRecords(
        sum(col("l_quantity").cast("bigint")).as("sum_qty"),
        count(lit(1)).as("n")
      )),

    // §2.1/6 partition.reduce_by_key — keyed fold (map-side combine).
    // Money summed as integral cents: bit-stable in any engine.
    "q_reduce_by_key" -> ((s, dir) =>
      Tables.lineitem(s, dir).reduceByKey(
        Seq(col("l_returnflag"), col("l_linestatus")),
        Seq(
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("bigint")).as("sum_base_cents"),
          count(lit(1)).as("count_order")
        )
      )),

    // §2.1/7 partition.split_by_key — bucket = key mod n, co-located.
    "q_split_by_key" -> ((s, dir) =>
      Tables.customer(s, dir)
        .splitByKey(col("c_custkey"), 8)
        .reduceByKey(Seq(col("bucket")), Seq(count(lit(1)).as("n")))),

    // §2.1/8 partition.join — broadcast hash join (dim side small).
    "q_join" -> ((s, dir) =>
      Tables.orders(s, dir)
        // customer scales with SF — no forced broadcast; a shuffle
        // hash join on custkey, or broadcast if AQE sees it fits
        .keyedJoin(
          Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey")
        )
        .mapRecords(col("o_orderkey"), col("c_name"), col("o_totalprice"))),

    // §2.1/8b partition.join's grouped OUTPUT SHAPE (the reference
    // emits (key, [lefts], [rights]) per key); arrays serialized to
    // csv strings for the cross-engine compare.
    "q_grouped_join" -> ((s, dir) =>
      Tables.customer(s, dir)
        .groupedJoin(Tables.orders(s, dir), "c_custkey", "o_custkey",
          col("c_name"), col("o_orderkey"))
        .mapRecords(col("c_custkey"),
          array_join(col("lefts"), ",").as("names"),
          array_join(transform(col("rights"), x => x.cast("string")), ",").as("orderkeys"))),

    // §2.2/22b salted join (skew scatter): row-identical to q_join by
    // construction — the oracle proves it (only the shuffle
    // distribution differs).
    "q_salted_join" -> ((s, dir) =>
      graft.operators.Skew
        .saltedJoin(
          Tables.orders(s, dir).withColumnRenamed("o_custkey", "custkey"),
          Tables.customer(s, dir).withColumnRenamed("c_custkey", "custkey"),
          "custkey", salts = 8,
          // salt on the natural row key so the scan stays pruned to
          // the 4 columns the query touches
          saltCols = Seq(col("o_orderkey")))
        .mapRecords(col("o_orderkey"), col("c_name"), col("o_totalprice"))),

    // §2.2/22b2 key-skew profile: the top-10 heaviest order-priority
    // keys with row share — the "does this join need salting" report.
    "q_skew_profile" -> ((s, dir) =>
      graft.operators.Skew.skewProfile(
        Tables.orders(s, dir), col("o_orderpriority"), topN = 10)),

    // §2.1/12b schema-evolution union: a v1 batch (no priority column)
    // unions a v2 batch (extra column) by name with null-fill.
    "q_union_evolve" -> ((s, dir) => {
      val v1 = Tables.orders(s, dir).filter(col("o_orderkey") % 2 === 0)
        .mapRecords(col("o_orderkey"), col("o_custkey"))
      val v2 = Tables.orders(s, dir).filter(col("o_orderkey") % 2 === 1)
        .mapRecords(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      v1.unionEvolved(v2)
    }),

    // §2.1/9 partition.count as a relation.
    "q_count" -> ((s, dir) => Tables.lineitem(s, dir).countRelation("n")),

    // §2.1/10 partition.head — deterministic top-n (TakeOrdered, no full sort).
    "q_head" -> ((s, dir) =>
      Tables.orders(s, dir)
        .mapRecords(col("o_orderkey"), col("o_totalprice"))
        .headRecords(10, col("o_totalprice").desc, col("o_orderkey").asc)),

    // §2.1/11 partitions.coalesce — narrow re-chunk; content unchanged.
    "q_coalesce" -> ((s, dir) => Tables.region(s, dir).coalescePartitions(1)),

    // §2.1/12 partitions.concat — unionByName of two partitioned sets.
    "q_concat" -> ((s, dir) => {
      val n = Tables.nation(s, dir)
      n.filterRecords(col("n_nationkey") < 12)
        .concatPartitions(n.filterRecords(col("n_nationkey") >= 12))
    }),

    // distinct-count aggregate (expands shmr's reduce_by_key family).
    "q_count_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir).reduceByKey(
        Seq(col("l_returnflag")),
        Seq(countDistinct(col("l_partkey")).as("n_parts"), count(lit(1)).as("n"))
      )),

    // §2.1/14 str2hashnumber — engine-portable stable hash.
    "q_hash" -> ((s, dir) =>
      Tables.customer(s, dir).mapRecords(
        col("c_custkey"),
        Hashing.portableHashHex(col("c_name")).as("h")
      ))
  )

  val oracleSql: Map[String, String] = Map(
    "q_map" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem""".stripMargin,
    "q_flat_map" ->
      "SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word FROM part",
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_distinct_by" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
        |      FROM customer) WHERE rn = 1""".stripMargin,
    "q_reduce" ->
      """SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem""".stripMargin,
    "q_reduce_by_key" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_split_by_key" ->
      """SELECT CAST(c_custkey % 8 AS INT) AS bucket, count(*) AS n
        |FROM customer GROUP BY 1""".stripMargin,
    "q_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_grouped_join" ->
      """WITH l AS (SELECT c_custkey, string_agg(c_name, ',' ORDER BY c_name) AS names
        |           FROM customer GROUP BY c_custkey),
        |r AS (SELECT o_custkey, string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS orderkeys
        |      FROM orders GROUP BY o_custkey)
        |SELECT c_custkey, names, orderkeys FROM l JOIN r ON c_custkey = o_custkey""".stripMargin,
    "q_salted_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_skew_profile" ->
      """WITH c AS (SELECT o_orderpriority AS key, count(*) AS cnt FROM orders GROUP BY 1),
        |     t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
        |SELECT key, cnt, CAST(cnt AS DOUBLE) / total AS share
        |FROM c CROSS JOIN t
        |ORDER BY cnt DESC, key ASC LIMIT 10""".stripMargin,
    "q_union_evolve" ->
      """SELECT o_orderkey, o_custkey, NULL AS o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin,
    "q_count" -> "SELECT count(*) AS n FROM lineitem",
    "q_head" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_coalesce" -> "SELECT r_regionkey, r_name FROM region",
    "q_concat" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_hash" ->
      "SELECT c_custkey, substr(md5(c_name), 1, 16) AS h FROM customer"
  )
}
