package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Text → integer embedding bridge: signed hashed bag-of-words
  * projection (feature hashing, Weinberger et al. 2009 "Feature
  * Hashing for Large Scale Multitask Learning") via the native
  * [[org.apache.spark.sql.graft.HashedBow]] expression.
  *
  * The point: a TEXT-ONLY corpus gets a dense integer vector per
  * document in one codegen'd scan — no external encoder, no model
  * download — and those vectors plug directly into every vector
  * operator the engine already has (brute-force / LSH / IVF cosine
  * top-k, kNN probes, SemDeDup). Sign-hashing makes each component an
  * unbiased estimate of the (impractically wide) exact bag-of-words
  * inner product, so cosine over the projection approximates lexical
  * cosine similarity at any vocabulary size.
  *
  * Everything stays integer-exact: components are signed token
  * counts, norms and dots run through the same quantized-cosine
  * machinery as real embeddings, so results replay bit-for-bit in the
  * DuckDB oracle.
  */
object HashEmbed {

  /** The native projection column: `dim`-long integer vector of a
    * text column (zero shuffles — one tight loop per row). */
  def hashedBow(text: Column, dim: Int): Column =
    org.apache.spark.sql.graft.GraftTextFunctions.hashedBow(text, dim)

  /** Corpus prepared for the integer-cosine operators: (vec_id, e,
    * nrm) — the same shape [[Similarity.prepareQuantized]] produces
    * for float embeddings, so [[Similarity.cosineTopK]] and friends
    * consume it unchanged. */
  def embedDocuments(df: DataFrame, text: Column, id: Column, dim: Int,
      extra: Column*): DataFrame =
    df.select(id.as("vec_id") +: extra :+ hashedBow(text, dim).as("e"): _*)
      .withColumn("nrm", Similarity.dotQ(col("e"), col("e")))
}
