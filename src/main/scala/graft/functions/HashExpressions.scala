package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-heavy dedup signatures.
  *
  * Semantically identical to the composed built-in versions in
  * `Dedup.minhashSignature` / `Dedup.simhashBits` (same tokenization, same
  * md5("i|token") hashing, same min/majority rules — the DuckDB oracles
  * verify this), but evaluated as one tight JVM loop per row instead of
  * O(numHashes * tokens) interpreted higher-order-function steps. ~10x
  * faster on the documents corpus; the difference grows with token count.
  *
  * CodegenFallback is fine here: the expression itself IS the hot loop;
  * there is nothing further for whole-stage codegen to fuse into it.
  */
private[graft] object HashSupport {
  val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = hex(md5Bytes(s))

  def md5Bytes(s: String): Array[Byte] = {
    val d = digest.get()
    d.reset()
    d.digest(s.getBytes(StandardCharsets.UTF_8))
  }

  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** token -> raw md5("i|token") digests for i in [0, count). Natural-language
    * vocabulary is Zipf-bounded, so a per-executor memo turns
    * O(rows * tokens * count) digests into O(vocab * count); bounded and
    * cleared wholesale when over capacity (values recompute deterministically).
    * Unsigned byte-array order == hex-string order, so callers can compare
    * digests raw and hex only the survivors. */
  // cap is an entry count chosen for BYTES: an entry holds `count` 16-byte
  // digests (+ headers), ~2-6 KB at count=32-128, so 2^16 entries bounds the
  // memo at a few hundred MB per executor even on a memo-hostile corpus
  // (UUID-like tokens that defeat the Zipf assumption)
  private val memoCap = 1 << 16
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Byte]]]()
  def tokenDigests(tok: String, count: Int): Array[Array[Byte]] = {
    if (memo.size > memoCap) memo.clear()
    memo.computeIfAbsent(count.toString + "|" + tok,
      _ => Array.tabulate(count)(i => md5Bytes(i.toString + "|" + tok)))
  }

  /** Tokens: whitespace-split of lowercased trimmed text (matches
    * TextFunctions.tokens); distinct, first-occurrence order. */
  def distinctTokens(text: String): Array[String] = {
    val t = text.trim.toLowerCase(java.util.Locale.ROOT)
    if (t.isEmpty) Array.empty
    else {
      val seen = new java.util.LinkedHashSet[String]()
      for (tok <- t.split("\\s+")) seen.add(tok)
      seen.toArray(new Array[String](seen.size))
    }
  }
}

/** array<string> MinHash signature: element i = min over distinct tokens of
  * md5(i || '|' || token). */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val toks = HashSupport.distinctTokens(input.asInstanceOf[UTF8String].toString)
    val mins = new Array[Array[Byte]](numHashes)
    var j = 0
    while (j < toks.length) {
      val digs = HashSupport.tokenDigests(toks(j), numHashes)
      var i = 0
      while (i < numHashes) {
        if (mins(i) == null || java.util.Arrays.compareUnsigned(digs(i), mins(i)) < 0)
          mins(i) = digs(i)
        i += 1
      }
      j += 1
    }
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) = UTF8String.fromString(if (mins(i) == null) "" else HashSupport.hex(mins(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignatureExpr = copy(child = c)
}

/** 64-char '0'/'1' SimHash string: bit b = majority over distinct tokens of
  * (high bit of first md5 nibble of md5(b || '|' || token)). */
case class SimHashBitsExpr(child: Expression, nBits: Int = 64)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val toks = HashSupport.distinctTokens(input.asInstanceOf[UTF8String].toString)
    val ones = new Array[Int](nBits)
    var j = 0
    while (j < toks.length) {
      val digs = HashSupport.tokenDigests(toks(j), nBits)
      var b = 0
      while (b < nBits) {
        // high bit of first nibble ('8'-'f') == bit 7 of digest byte 0
        if ((digs(b)(0) & 0x80) != 0) ones(b) += 1
        b += 1
      }
      j += 1
    }
    val sb = new java.lang.StringBuilder(nBits)
    var b = 0
    while (b < nBits) {
      sb.append(if (2 * ones(b) > toks.length) '1' else '0')
      b += 1
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): SimHashBitsExpr = copy(child = c)
}

/** array<long> of distinct 60-bit hashed n-gram shingles: for each n-token
  * window of the tokenized text, the first 15 hex chars of md5(shingle)
  * parsed as a long (DuckDB twin: ('0x'||substr(md5(s),1,15))::BIGINT).
  * Whole-document shingle when fewer than n tokens. */
case class NgramShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String].toString.trim.toLowerCase(java.util.Locale.ROOT)
    val toks: Array[String] = if (t.isEmpty) Array.empty else t.split("\\s+")
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    def hash(s: String): java.lang.Long =
      java.lang.Long.parseLong(HashSupport.md5Hex(s).substring(0, 15), 16)
    if (toks.length < n) out.add(hash(toks.mkString(" ")))
    else {
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(hash(sb.toString))
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }
  override protected def withNewChildInternal(c: Expression): NgramShinglesExpr = copy(child = c)
}

/** array<long> of POSITIONED n-gram window hashes: element i = the 60-bit
  * md5 hash (same scheme as NgramShinglesExpr) of the n-token window
  * starting at token i. NOT distinct — the array index IS the window start,
  * which is what span-level dedup needs (`posexplode` recovers (pos, h)).
  * Docs with fewer than n tokens yield an empty array (no full window).
  * DuckDB twin: list_transform(range(0, len(toks)-n+1),
  *   i -> ('0x'||substr(md5(array_to_string(toks[i+1:i+n], ' ')),1,15))::BIGINT). */
case class NgramWindowHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String].toString.trim.toLowerCase(java.util.Locale.ROOT)
    val toks: Array[String] = if (t.isEmpty) Array.empty else t.split("\\s+")
    val nw = toks.length - n + 1
    if (nw <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](nw)
      var i = 0
      while (i < nw) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = java.lang.Long.parseLong(
          HashSupport.md5Hex(sb.toString).substring(0, 15), 16)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
  override protected def withNewChildInternal(c: Expression): NgramWindowHashesExpr = copy(child = c)
}

object HashExpressions {
  import org.apache.spark.sql.GraftColumnBridge._
  def minhashSignature(text: Column, numHashes: Int): Column =
    column(MinHashSignatureExpr(expression(text), numHashes))
  def simhashBits(text: Column, nBits: Int = 64): Column =
    column(SimHashBitsExpr(expression(text), nBits))
  def ngramShingles(text: Column, n: Int): Column =
    column(NgramShinglesExpr(expression(text), n))
  def ngramWindowHashes(text: Column, n: Int): Column =
    column(NgramWindowHashesExpr(expression(text), n))
}
