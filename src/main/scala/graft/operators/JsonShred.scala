package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed JSON document shredding — the "rich" counterpart to the
  * single-path `get_json_object` op (reference shmr deserializes whole
  * records with orjson, i.e. full-document parsing, not path
  * extraction; see shmr/partition.py deser_fn usage).
  *
  * `packJsonPerKey` nests one JSON document per key (header + item
  * array); `shredJson` parses documents with an EXPLICIT DDL schema
  * (`from_json` — codegen'd Jackson parse, no sampling pass) and
  * flattens the nested array back to typed rows. Explicit schemas are
  * the scale path: `spark.read.json` infers by scanning the data
  * twice, while `from_json(col, ddl)` is a single pass and never
  * drifts when a late partition adds a field.
  *
  * Scale notes: packing is one shuffle on the key with map-side
  * partial `collect_list` bounded by items-per-key (order baskets,
  * not unbounded streams); shredding is a narrow per-row parse +
  * explode — no shuffle at all.
  */
object JsonShred {

  implicit class JsonShredOps(private val df: DataFrame) extends AnyVal {

    /** One JSON document per key: `{"key": k, "items": [{...}, ...]}`.
      * Item array order is collection order (nondeterministic across
      * shuffles) — treat the array as a set, or sort it downstream,
      * when exact bytes matter. */
    def packJsonPerKey(key: Column, items: Seq[(String, Column)]): DataFrame =
      df.groupBy(key.as("__k"))
        .agg(collect_list(struct(items.map { case (n, c) => c.as(n) }: _*)).as("__items"))
        .select(to_json(struct(col("__k").as("key"), col("__items").as("items"))).as("doc"))

    /** Parse `doc` with the given DDL schema (must contain a scalar
      * `key` and an array-of-struct `items`), explode the array, and
      * return one typed row per item: (key, item fields...). Rows
      * whose document fails to parse are dropped (from_json yields
      * null → explode of null array drops the row). */
    def shredJson(doc: Column, ddlSchema: String): DataFrame = {
      val parsed = df.select(
        from_json(doc, org.apache.spark.sql.types.StructType.fromDDL(ddlSchema)).as("__j"))
      val itemFields = parsed.select(explode(col("__j.items")).as("__it"))
        .select(col("__it.*")).columns
      parsed
        .select(col("__j.key").as("key"), explode(col("__j.items")).as("__it"))
        .select(col("key") +: itemFields.map(f => col(s"__it.$f").as(f)): _*)
    }
  }
}
