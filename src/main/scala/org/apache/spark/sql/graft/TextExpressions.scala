// Hosted under org.apache.spark.sql.* because ExpectsInputTypes /
// AbstractDataType / ExpressionUtils are private[sql] in Spark 4 —
// the standard technique for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling for the dedup hot path (SURVEY.md §2.3).
  *
  * The built-in formulation — `transform(sequence(...), i =>
  * concat_ws(" ", element_at(toks, i+1), ...))` — is a nested
  * higher-order function: interpreted eval, a lambda frame plus n
  * element_at calls PER GRAM per row, and it is re-evaluated for
  * every consumer branch of the plan. This expression does one tight
  * loop per row. Shingling is embarrassingly parallel, so the
  * per-row-native (not shuffle-based) shape is the one that scales
  * to a 100 TB corpus.
  *
  * Semantics bit-match the HOF formulation (and the DuckDB oracle):
  * tokens = split(trim(lower(text)), "\\s+"), grams joined with a
  * single space, empty array when fewer than n tokens.
  */
@ExpressionDescription(
  usage = "_FUNC_(text, n) - space-joined lowercase word n-grams of text."
)
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // trim/lower via UTF8String so casing matches Spark's lower()
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native lowercase CHARACTER n-grams — backs the language-profile
  * family the way [[WordShingles]] backs dedup. The built-in
  * formulation (explode(sequence(1, len−n+1)) + substring) allocates
  * a position array per row and evaluates a substring expression per
  * gram; this is one tight loop over the row's chars. Char positions
  * (not bytes), matching Spark's `substring`. Empty array below n
  * chars. */
@ExpressionDescription(
  usage = "_FUNC_(text, n) - lowercase character n-grams of text."
)
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(n >= 1, "gram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override protected def nullSafeEval(input: Any): Any =
    CharShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.CharShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingles {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val lower = text.toLowerCase
    val len = lower.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i < out.length) {
      // substringSQL is 1-based and char-indexed, like Spark substring
      out(i) = lower.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native winnowing fingerprints (Schleimer–Wilkerson–Aiken): the
  * ENTIRE selection — lowercase char k-grams, portable 60-bit md5
  * hash per gram, trailing-window-w minimum, select positions whose
  * hash equals the window min, dedup — runs inside the row in one
  * O(len) pass (monotonic deque for the sliding min).
  *
  * This is the difference between shipping every char-gram of a
  * 100 TB corpus through a per-document window exchange (the
  * composed formulation: posexplode → hash → window min → filter)
  * and a pure scan: the fingerprints never leave the row until the
  * ~2/(w+1)-density result explodes. Hash family is identical to
  * `Dedup.portableTokenHash` (top 60 bits of md5), so the DuckDB
  * oracle replay is unchanged. */
@ExpressionDescription(
  usage = "_FUNC_(text, k, w) - distinct winnowing fingerprints (60-bit md5 of char k-grams, window w)."
)
case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(k >= 1 && w >= 1, "gram size and window must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WinnowHashes.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowHashes.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared portable 60-bit hash: top 60 bits of md5 — bit-equal to
  * conv(substring(md5(s), 1, 15), 16, 10) and to DuckDB's
  * ('0x' || substr(md5(s), 1, 15))::BIGINT. */
private[graft] object Md5Top60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(g: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    pack(md.digest(g.getBytes))
  }

  /** Slice variant: hash `len` bytes at `off` without materializing a
    * per-gram UTF8String — the winnowing hot path. */
  def hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digest.get()
    md.reset()
    md.update(bytes, off, len)
    pack(md.digest())
  }

  private def pack(d: Array[Byte]): Long = {
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  /** Hashed-feature (bucket, sign) packed as (value28 << 1) | parity:
    * value28 = the 7-hex-char md5 prefix (bit-equal to
    * conv(substring(md5(s), 1, 7), 16, 10) / DuckDB
    * ('0x' || substr(md5(s), 1, 7))::BIGINT), parity = low bit of the
    * 8th hex char. One packed long per token — no tuple allocation on
    * the HashedBow hot path. */
  def bucketSignPacked(g: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(g.getBytes)
    val value28 =
      ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) | ((d(2) & 0xffL) << 4) |
        ((d(3) & 0xffL) >>> 4)
    (value28 << 1) | (d(3) & 1L)
  }
}

object WinnowHashes {
  import Md5Top60.hash60

  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val lower = text.toLowerCase
    val len = lower.numChars()
    if (len < k) return new GenericArrayData(Array.empty[Any])
    val n = len - k + 1
    val hs = new Array[Long](n)
    // gram i spans code points [i, i+k): slide start/end BYTE offsets
    // one code point per step and hash the byte slice directly — a
    // positional substring per gram would re-walk the string from the
    // front each time (O(len²) char scans) and allocate a UTF8String
    // + byte copy per gram
    val bytes = lower.getBytes
    var start = 0
    var end = 0
    var c = 0
    while (c < k) { end += UTF8String.numBytesForFirstByte(bytes(end)); c += 1 }
    var i = 0
    while (i < n) {
      hs(i) = hash60(bytes, start, end - start)
      start += UTF8String.numBytesForFirstByte(bytes(start))
      if (end < bytes.length) end += UTF8String.numBytesForFirstByte(bytes(end))
      i += 1
    }
    // sliding trailing-window min via monotonic deque of positions;
    // position p is selected iff hs(p) == min(hs(p-w+1 .. p))
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      while (head < tail && dq(head) <= i - w) head += 1
      while (head < tail && hs(dq(tail - 1)) > hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (hs(dq(head)) == hs(i) && seen.add(hs(i))) out += hs(i)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native 60-bit SimHash of whitespace tokens — the per-document half
  * of SimHash dedup in ONE row-local pass: hash each token (portable
  * md5-top-60 family), majority-vote every bit (ties → 0), pack.
  *
  * The composed formulation (explode tokens → per-token hash → 60
  * bit-sum aggregate expressions per doc group) ships EVERY token of
  * the corpus through the per-doc aggregation exchange; this is a
  * pure scan. Semantics bit-match it: tokens =
  * split(trim(lower(text)), "\s+"), hash = portableTokenHash. */
@ExpressionDescription(
  usage = "_FUNC_(text) - 60-bit SimHash of whitespace tokens (portable md5 hash family)."
)
case class SimHash60(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SimHash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  val Bits = 60

  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    // trim/lower via UTF8String, split like Spark's split(_, "\\s+")
    // — the exact token stream of the aggregate formulation
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < toks.length) {
      val h = Md5Top60.hash60(UTF8String.fromString(toks(i)))
      var j = 0
      while (j < Bits) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    val n = toks.length
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (counts(j) * 2 > n) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

/** Native signed hashed bag-of-words projection (feature hashing,
  * Weinberger et al. 2009) — text → dense `dim`-long INTEGER vector
  * in one row-local pass: every whitespace token lands in an
  * md5-derived bucket with an md5-derived ±1 sign. The text-only
  * corpus's bridge into the vector operators: the output plugs
  * straight into the integer-cosine family
  * ([[graft.similarity.Similarity]] top-k/kNN, SemDeDup, IVF) with
  * no external encoder and no float anywhere — embeddings, dots and
  * cosines all replay bit-for-bit in any engine.
  *
  * The composed formulation (explode tokens → groupBy (doc, bucket)
  * → sum signs → re-assemble arrays) ships every token of the corpus
  * through TWO exchanges; this is a pure scan — the only shape that
  * holds at 100 TB. Hash family: bucket = 7-hex-char md5 prefix mod
  * dim, sign = parity of the 8th hex char (both replayable as
  * substr(md5(t), ...) in SQL).
  */
@ExpressionDescription(
  usage = "_FUNC_(text, dim) - signed hashed bag-of-words projection of whitespace tokens to a dim-long integer vector."
)
case class HashedBow(child: Expression, dim: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  require(dim >= 1, "projection dimension must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_bow"

  override protected def nullSafeEval(input: Any): Any =
    HashedBow.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.HashedBow.compute($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedBow {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String, dim: Int): ArrayData = {
    // trim/lower via UTF8String so casing matches Spark's lower();
    // token stream identical to the other text expressions
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    val acc = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      val ps = Md5Top60.bucketSignPacked(UTF8String.fromString(toks(i)))
      val bucket = ((ps >>> 1) % dim).toInt
      acc(bucket) += (if ((ps & 1L) == 1L) 1L else -1L)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(acc)
  }
}

/** Column facade + SQL registration for the text expressions. */
/** Native Unicode NFC normalization — the canonicalization step that
  * must run BEFORE any hashing/dedup/fingerprint at corpus scale:
  * "café" composed and decomposed are different byte strings (so
  * different md5/minhash/simhash) but the same text; a crawl mixes
  * both freely. Spark has no normalization builtin; this expression
  * calls `java.text.Normalizer` (ICU-equivalent NFC) in a codegen'd
  * per-row pass. Fast path: pure-ASCII rows (the overwhelming bulk
  * of most corpora) are returned UNCHANGED without materializing a
  * Java String — one byte scan decides. Matches DuckDB
  * `nfc_normalize` for the oracle. */
@ExpressionDescription(
  usage = "_FUNC_(text) - Unicode NFC canonical composition of text."
)
case class NormalizeNFC(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeNFC.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.NormalizeNFC.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeNFC {
  def compute(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) { // non-ASCII byte: take the slow path
        val s = text.toString
        val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
        return if (n == s) text else UTF8String.fromString(n)
      }
      i += 1
    }
    text // pure ASCII is NFC by construction
  }
}

/** All five Gopher document metrics in ONE native pass per row
  * (SURVEY.md §2.5/31h hot path): word count, summed token chars,
  * stopword hits, letter-bearing words, and the most frequent word
  * 2-gram with its count. The HOF formulation evaluated five separate
  * interpreted lambda folds per row — each re-splitting the text, the
  * top-2-gram leg O(g²) — and, being CodegenFallback, was exempt from
  * common-subexpression elimination, so a filter predicate paid it
  * several times over (measured ~4 s per corpus filter pass at
  * sf0.1). Semantics bit-match the previous column formulation:
  * tokens = split(trim(text), "\\s+") (SQL trim = 0x20 only; Java
  * regex split, limit −1), lengths in code points, stopword test on
  * the lowercased token, alpha = contains an ASCII letter, grams via
  * [[WordShingles.compute]] with count ties to the binary-smallest
  * gram. */
@ExpressionDescription(
  usage = "_FUNC_(text) - struct of the five Gopher document metrics."
)
case class GopherMetrics(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = GopherMetrics.outType
  override def prettyName: String = "graft_gopher_metrics"

  override protected def nullSafeEval(input: Any): Any =
    GopherMetrics.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.GopherMetrics.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherMetrics {
  val outType: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_chars_tok", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("alpha_words", LongType, nullable = false),
    StructField("best", StructType(Seq(
      StructField("c", LongType, nullable = false),
      StructField("g", StringType, nullable = false))), nullable = false)))

  // graft.text.TextAnalysis.enStopwords, precompiled to UTF8String
  private val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    graft.text.TextAnalysis.enStopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  private val ws = UTF8String.fromString("\\s+")
  private val emptyStr = UTF8String.fromString("")

  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    // tokens exactly as split(trim(text), "\\s+"): SQL trim (0x20
    // only) then Java regex split with limit -1 — UTF8String.split is
    // the same code path Spark's StringSplit runs
    val toks = text.trim().split(ws, -1)
    var n = 0L; var c = 0L; var s = 0L; var a = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      n += 1L
      c += t.numChars().toLong
      if (stopSet.contains(t.toLowerCase)) s += 1L
      // rlike "[A-Za-z]": ASCII letters are single UTF-8 bytes, so a
      // byte scan is exact (continuation/lead bytes are >= 0x80)
      val b = t.getBytes
      var j = 0
      var alpha = false
      while (j < b.length && !alpha) {
        val x = b(j)
        alpha = (x >= 'A' && x <= 'Z') || (x >= 'a' && x <= 'z')
        j += 1
      }
      if (alpha) a += 1L
      i += 1
    }
    // most frequent 2-gram: sort (UTF8String binary order, matching
    // array_sort) then run-count with a strict > — first maximum in
    // ascending order = count ties keep the binary-smallest gram
    val grams = WordShingles.compute(text, 2)
    var bc = 0L
    var bg: UTF8String = emptyStr
    val m = grams.numElements()
    if (m > 0) {
      val arr = new Array[UTF8String](m)
      var k = 0
      while (k < m) { arr(k) = grams.getUTF8String(k); k += 1 }
      java.util.Arrays.sort(arr, (x: UTF8String, y: UTF8String) => x.compareTo(y))
      var run = 0L
      var prev: UTF8String = null
      k = 0
      while (k < m) {
        val g = arr(k)
        run = if (prev != null && g.equals(prev)) run + 1L else 1L
        if (run > bc) { bc = run; bg = g }
        prev = g
        k += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(n, c, s, a,
      org.apache.spark.sql.catalyst.InternalRow(bc, bg))
  }
}

object GraftTextFunctions {
  import org.apache.spark.sql.SparkSessionExtensions
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase

  def wordShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n))

  def gopherMetrics(text: Column): Column =
    ExpressionUtils.column(GopherMetrics(ExpressionUtils.expression(text)))

  def charShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(CharShingles(ExpressionUtils.expression(text), n))

  def winnowHashes(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowHashes(ExpressionUtils.expression(text), k, w))

  def simHash60(text: Column): Column =
    ExpressionUtils.column(SimHash60(ExpressionUtils.expression(text)))

  def hashedBow(text: Column, dim: Int): Column =
    ExpressionUtils.column(HashedBow(ExpressionUtils.expression(text), dim))

  def normalizeNfc(text: Column): Column =
    ExpressionUtils.column(NormalizeNFC(ExpressionUtils.expression(text)))

  /** The SQL builders take the gram size as a foldable int literal
    * (`SELECT graft_shingles(text, 3)`). */
  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: gram size must be an integer literal, got $other")
  }

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      FunctionRegistryBase.expressionInfo[WordShingles]("graft_shingles", None),
      (children: Seq[Expression]) =>
        WordShingles(children(0), litInt(children(1), "graft_shingles"))))
    ext.injectFunction((
      FunctionIdentifier("graft_char_shingles"),
      FunctionRegistryBase.expressionInfo[CharShingles]("graft_char_shingles", None),
      (children: Seq[Expression]) =>
        CharShingles(children(0), litInt(children(1), "graft_char_shingles"))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_hashes"),
      FunctionRegistryBase.expressionInfo[WinnowHashes]("graft_winnow_hashes", None),
      (children: Seq[Expression]) =>
        WinnowHashes(children(0), litInt(children(1), "graft_winnow_hashes"),
          litInt(children(2), "graft_winnow_hashes"))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      FunctionRegistryBase.expressionInfo[SimHash60]("graft_simhash60", None),
      (children: Seq[Expression]) => SimHash60(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_hashed_bow"),
      FunctionRegistryBase.expressionInfo[HashedBow]("graft_hashed_bow", None),
      (children: Seq[Expression]) =>
        HashedBow(children(0), litInt(children(1), "graft_hashed_bow"))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      FunctionRegistryBase.expressionInfo[NormalizeNFC]("graft_nfc", None),
      (children: Seq[Expression]) => NormalizeNFC(children(0))))
  }
}
