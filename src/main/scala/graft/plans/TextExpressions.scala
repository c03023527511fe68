package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-dedup hot path.
  *
  * The higher-order-function formulations (`transform`+`slice`+
  * `concat_ws` for shingles; 128 `array_min(transform(...))` folds for
  * MinHash; 64 `aggregate` folds for SimHash) are interpreted
  * per-element per-lambda; at 5k docs they already cost tens of
  * seconds, at 100 TB they'd dominate the job. These expressions do
  * the same work in one compiled pass per row. They are
  * CodegenFallback (the body is already a tight JVM loop; the win is
  * escaping the interpreted expression-tree evaluation, not codegen
  * of string plumbing).
  *
  * All hashing uses XXH64 with seed 42 — the same kernel and default
  * seed as Spark's built-in `xxhash64`, so signatures are identical
  * to the composable formulation and stable cluster-wide.
  */
object TextExprs {
  final val XxSeed = 42L

  def xxh64(s: UTF8String): Long =
    XXH64.hashUTF8String(s, XxSeed)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The portable 60-bit hash ([[graft.operators.Dedup.portableHash60]])
    * computed natively: integer value of the first 15 hex chars of md5
    * = the top 60 bits of the digest, nibble-folded. Identical to the
    * `conv(substring(md5(s),1,15),16,10)` column form, but one digest
    * call in a compiled loop instead of an interpreted per-element
    * lambda (the HOF `transform` formulation benchmarked 5× slower on
    * the simhash query).
    */
  // Oracle-robustness salt (empty by default — bit-identical to the
  // committed baseline). Prepended to every md5Hash60 input, matching
  // the salted duckHex60 and Dedup.portableHash60 forms.
  private val saltBytes: Array[Byte] =
    graft.config.PortableSalt.hashPrefix.getBytes("UTF-8")

  def md5Hash60(s: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    if (saltBytes.length != 0) d.update(saltBytes)
    val dig = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 15) {
      val nib =
        if ((i & 1) == 0) (dig(i >> 1) >> 4) & 0xF
        else dig(i >> 1) & 0xF
      acc = (acc << 4) | nib
      i += 1
    }
    acc
  }
}

/** Distinct word n-gram shingles over a token array.
  * Matches `array_distinct(transform(sequence(0, max(len-n,0)),
  * i -> concat_ws(" ", slice(toks, i+1, n))))`: max(len-n+1, 1)
  * shingles, the tail one clamped when len < n; first-occurrence
  * dedup order.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val len = toks.numElements()
    val count = math.max(len - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < count) {
      val hi = math.min(i + n, len)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) { parts(j - i) = toks.getUTF8String(j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature: for each (a_k, b_k), min over shingles of
  * (a_k · (h(s) mod P) + b_k) mod P. One pass over the shingle
  * array computes all K signature rows.
  *
  * Input is either `array<string>` (shingles hashed in-loop with the
  * fast xxh64 kernel — the production path) or `array<bigint>` of
  * PRE-hashed shingles (the oracle-parity path, where the hash must be
  * reproducible in other engines — see `Dedup.portableHash60`).
  */
case class MinHashSignatureExpr(child: Expression, coeffs: Seq[(Long, Long)], prime: Long,
                                portableMd5: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val as: Array[Long] = coeffs.map(_._1).toArray
  private val bs: Array[Long] = coeffs.map(_._2).toArray

  @transient private lazy val prehashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (prehashed) shingles.getLong(i)
        else if (portableMd5) TextExprs.md5Hash60(shingles.getUTF8String(i))
        else TextExprs.xxh64(shingles.getUTF8String(i))
      val red = java.lang.Math.floorMod(h, prime)
      var j = 0
      while (j < k) {
        val v = java.lang.Math.floorMod(as(j) * red + bs(j), prime)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash over a token array: per token-hash bit, fold a +1/-1
  * counter; sign bits packed MSB-first (bit nBits-1 of the hash
  * first), matching the composable `foldLeft` formulation in
  * [[graft.operators.Dedup.simhash64]].
  *
  * `array<string>` input hashes tokens in-loop with xxh64 (production,
  * nBits=64); `array<bigint>` input uses the pre-hashed values
  * directly (oracle-parity path with the portable 60-bit hash).
  */
case class SimHash64Expr(child: Expression, nBits: Int = 64, portableMd5: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 64)
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  @transient private lazy val prehashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  // Token distributions are Zipfian — memoize md5 results per
  // expression instance (one per task, single-threaded eval) with a
  // bounded map; >90% of occurrences hit the cache on natural text,
  // cutting the digest cost of the portable path several-fold.
  @transient private lazy val md5Cache = new java.util.HashMap[String, java.lang.Long](1 << 12)

  private def portableHash(s: UTF8String): Long = {
    val key = s.toString
    val hit = md5Cache.get(key)
    if (hit != null) hit.longValue()
    else {
      if (md5Cache.size >= (1 << 16)) md5Cache.clear()
      val h = TextExprs.md5Hash60(s)
      md5Cache.put(key, h)
      h
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](nBits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (prehashed) toks.getLong(i)
        else if (portableMd5) portableHash(toks.getUTF8String(i))
        else TextExprs.xxh64(toks.getUTF8String(i))
      var b = 0
      while (b < nBits) {
        counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var packed = 0L
    // Fold order i = 0..nBits-1 with acc<<1|bit ⇒ bit for shift i ends
    // up at position nBits-1-i, same as the expression-tree version.
    var b = 0
    while (b < nBits) {
      packed = (packed << 1) | (if (counters(b) > 0) 1L else 0L)
      b += 1
    }
    packed
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
  * algorithm) over a token array: hash every `gramSize`-token window
  * with the portable md5-60 kernel, slide a window of `w` consecutive
  * gram hashes, select the MINIMUM hash per window (rightmost on
  * ties), and emit the hash at each DISTINCT selected position in
  * first-selection order — exactly the
  * `transform(windows, ...array_min/array_position...)` +
  * `array_distinct` column formulation, but as one O(grams·w) compiled
  * loop that computes each gram's digest ONCE.
  *
  * Why native: the HOF formulation captures the gram-hash array
  * inside the per-window lambda, and interpreted HOF evaluation
  * re-computes a lambda-captured array per window per reference —
  * md5-of-every-gram times windows times three references, a
  * multiplicative blow-up measured at >5 min/query on 5k docs. This
  * expression is the same shape fix as [[MinHashSignatureExpr]].
  *
  * Engine-portable: every emitted hash is the 60-bit md5 integer
  * ([[TextExprs.md5Hash60]]) of the space-joined gram, so a DuckDB
  * oracle replays the selection exactly. Output `array<bigint>`;
  * empty when the document has fewer than `gramSize + w - 1` tokens
  * (no complete hash window).
  */
case class WinnowingExpr(child: Expression, gramSize: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(gramSize >= 2, s"gramSize must be >= 2, got $gramSize")
  require(w >= 1, s"window w must be >= 1, got $w")
  override def prettyName: String = "winnowing_fingerprints"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val emptyResult = new GenericArrayData(Array.emptyLongArray)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val nGrams = math.max(n - (gramSize - 1), 0)
    val nWin = nGrams - (w - 1)
    if (nWin <= 0) return emptyResult
    // Every gram hashed exactly once.
    val hs = new Array[Long](nGrams)
    val space = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](gramSize)
    var i = 0
    while (i < nGrams) {
      var j = 0
      while (j < gramSize) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      hs(i) = TextExprs.md5Hash60(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    // Rightmost-minimum per window; winnowing selections are
    // non-decreasing in position, so first-occurrence dedup
    // (= array_distinct on the position list) is a last-pos check.
    val out = new Array[Long](nWin)
    var m = 0
    var last = -1
    var wi = 0
    while (wi < nWin) {
      var minV = Long.MaxValue
      var minP = wi
      var j = wi
      val end = wi + w
      while (j < end) {
        if (hs(j) <= minV) { minV = hs(j); minP = j }
        j += 1
      }
      if (minP != last) { out(m) = hs(minP); m = m + 1; last = minP }
      wi += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Positioned gram hashes over a token array: chunk i covers tokens
  * [i·stride, i·stride + gramSize); emits
  * `array<struct<pos int, h bigint>>` with h = the portable 60-bit
  * md5 of the space-joined gram and pos = i. `stride = 1` gives the
  * overlapping-gram stream (substring dedup), `stride = gramSize`
  * the aligned-chunk stream (chunk dedup). Only complete grams are
  * emitted: count = floor((n − gramSize)/stride) + 1, zero when
  * n < gramSize.
  *
  * Native for the same reason as [[WinnowingExpr]]: the
  * `transform(indices, i -> …slice(toks, …)…)` formulation captures
  * the token array inside the lambda, and a lambda-captured computed
  * expression re-evaluates per element — the whole normalize+split
  * re-ran per gram, O(tokens²) per document. Here every token is
  * read once and every gram digested once.
  */
case class GramPosHashExpr(child: Expression, gramSize: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {
  require(gramSize >= 1, s"gramSize must be >= 1, got $gramSize")
  require(stride >= 1, s"stride must be >= 1, got $stride")
  override def prettyName: String = "gram_pos_hash"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < gramSize) return new GenericArrayData(Array.empty[Any])
    val count = (n - gramSize) / stride + 1
    val out = new Array[Any](count)
    val space = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](gramSize)
    var i = 0
    while (i < count) {
      val base = i * stride
      var j = 0
      while (j < gramSize) { parts(j) = toks.getUTF8String(base + j); j += 1 }
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        i, TextExprs.md5Hash60(UTF8String.concatWs(space, parts: _*)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed unigram+bigram linear-classifier logit of a token array —
  * the fastText-style featurize-and-score step in ONE compiled pass:
  * bucket `floorMod(md5_60("u:" + tok), numBuckets)` per token and
  * `floorMod(md5_60("b:" + t1 + " " + t2), numBuckets)` per adjacent
  * pair (the exact strings of the composable `concat`/
  * `portableHash60` formulation, so scores are bit-identical and
  * oracle-replayable), then sum the dense weight vector at those
  * buckets. The weight model is a constructor literal — the same
  * plan-literal treatment as PQ codebooks. Native because the
  * per-element interpreted chain (md5 → hex substring → base-16 conv
  * → cast, then a map/array lookup per feature) priced the featurize
  * fold in tens of seconds at sf0.1. Output
  * `struct<n_features bigint, logit_q bigint>`.
  */
case class ClassifierLogitExpr(child: Expression, weights: Seq[Long])
    extends UnaryExpression with CodegenFallback {
  require(weights.nonEmpty, "weights must be non-empty")
  override def prettyName: String = "classifier_logit"
  override def dataType: DataType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("logit_q", LongType, nullable = false)))

  private val w: Array[Long] = weights.toArray
  private val nB: Long = w.length.toLong
  private val uPre = UTF8String.fromString("u:")
  private val bPre = UTF8String.fromString("b:")
  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var logit = 0L
    var i = 0
    while (i < n) {
      logit += w(java.lang.Math.floorMod(
        TextExprs.md5Hash60(UTF8String.concat(uPre, toks.getUTF8String(i))), nB).toInt)
      i += 1
    }
    var j = 0
    while (j < n - 1) {
      logit += w(java.lang.Math.floorMod(
        TextExprs.md5Hash60(UTF8String.concat(
          bPre, toks.getUTF8String(j), space, toks.getUTF8String(j + 1))), nB).toInt)
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow((n + math.max(n - 1, 0)).toLong, logit)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
