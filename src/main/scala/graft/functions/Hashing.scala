package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Stable hashing, replacing shmr's `str2hashnumber` (CityHash64,
  * /root/reference/shmr/funcs.py:27). Two tiers:
  *
  *   - [[stableHash64]] — xxhash64, a native codegen'd Catalyst
  *     expression; the fast path for internal keying (split_by_key,
  *     minhash, LSH banding). Stable across Spark versions/JVMs.
  *   - [[portableHash64]] / [[portableHashHex]] — md5-derived; bit-for-
  *     bit reproducible in any engine (DuckDB, Trino, Python), for
  *     cross-system fingerprints that outlive the Spark job.
  */
object Hashing {

  /** 64-bit xxhash of the given columns (seed 42, Spark built-in). */
  def stableHash64(cols: Column*): Column = xxhash64(cols: _*)

  /** Engine-portable 64-bit hash: first 15 hex digits of md5 as a
    * non-negative long (60 bits, so no sign issues anywhere). */
  def portableHash64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Engine-portable 64-bit hash as 16 hex chars. */
  def portableHashHex(c: Column): Column =
    substring(md5(c.cast("string")), 1, 16)

  /** Bucket id in [0, n) from an integral key — shmr `split_by_key`'s
    * `key mod n` (reference shmr/partition.py:239). */
  def keyBucket(key: Column, n: Int): Column = pmod(key, lit(n)).cast("int")
}
