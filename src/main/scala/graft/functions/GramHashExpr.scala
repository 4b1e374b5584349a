package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * All character-n-gram hashes of a text in ONE pass over its UTF-8
 * bytes: `gram_hashes(text, n, mode, fullOnly)` returns
 * `array<long>` where element j is the hash of the gram starting at
 * 1-based character position j + 1.
 *
 * Semantics are EXACTLY those of the builtin formulation it replaces
 * (`explode(sequence(1, greatest(length(text) - (n-1), 1)))` +
 * `substring(text, i, n)` + per-mode hash):
 *
 *  - `numChars >= n`: one element per full gram, positions
 *    1 .. numChars - n + 1;
 *  - `numChars < n` and !fullOnly: ONE element, the hash of the whole
 *    (truncated) text — what `substring(text, 1, n)` produces there;
 *  - `numChars < n` and fullOnly: empty array (the
 *    `length(gram) === n` filter's effect).
 *
 * Hash modes (same keys as [[graft.ops.TextDedup]]):
 *  - `md5`: the engine's cross-engine-stable 60-bit key —
 *    bit-identical to `conv(substring(md5(gram), 1, 15), 16, 10)
 *    .cast(long)` (= first 60 bits of the digest, i.e. the first
 *    8 bytes big-endian >>> 4), but computed digest-direct: no hex
 *    string, no substring, no base-conversion round-trip, and a
 *    single-block MD5 kernel for grams <= 55 bytes (every real gram;
 *    RFC 1321 arithmetic) with a MessageDigest fallback for longer
 *    payloads.
 *  - `xxhash64`: delegates to Spark's own
 *    [[org.apache.spark.sql.catalyst.expressions.XXH64]] with the
 *    XxHash64 expression's seed (42), so values equal
 *    `xxhash64(substring(text, i, n))` bit-for-bit.
 *
 * Gram bytes are the byte range between the gram's code-point
 * boundaries — identical to the UTF-8 encoding of
 * `substring(text, i, n)` for well-formed input (the only input the
 * substring formulation itself was defined on).
 *
 * This is guide §1.2-step-2 / §4 work: the gram hash is the per-task
 * hot loop of the dedup/decontamination operators (one hash per
 * character of the corpus), and the builtin chain spent most of its
 * time materializing hex and decimal strings per gram.
 */
case class GramHashesExpr(child: Expression, n: Int, md5Mode: Boolean,
                          fullOnly: Boolean)
  extends UnaryExpression {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes needs a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    GramHashesExpr.compute(input.asInstanceOf[UTF8String], n, md5Mode, fullOnly)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashesExpr.compute($c, $n, $md5Mode, $fullOnly)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashesExpr {

  def gramHashes(text: Column, n: Int, mode: String,
                 fullOnly: Boolean): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val md5Mode = mode match {
      case "md5" => true
      case "xxhash64" => false
      case other => throw new IllegalArgumentException(
        s"unknown gram hash mode: $other (xxhash64 | md5)")
    }
    ColumnBridge.column(
      GramHashesExpr(ColumnBridge.expression(text), n, md5Mode, fullOnly))
  }

  /** Entry shared by interpreted eval and codegen. */
  def compute(s: UTF8String, n: Int, md5Mode: Boolean,
              fullOnly: Boolean): GenericArrayData = {
    val bytes = s.getBytes
    val numBytes = bytes.length
    // code-point start offsets; offs(numChars) == numBytes sentinel
    val offs = new Array[Int](numBytes + 1)
    var numChars = 0
    var i = 0
    while (i < numBytes) {
      offs(numChars) = i
      numChars += 1
      val w = UTF8String.numBytesForFirstByte(bytes(i))
      i += w
    }
    // malformed tail claiming past the end clamps to the buffer, like
    // UTF8String.substring's own bounds handling
    val end = numBytes
    if (numChars < n) {
      if (fullOnly) return new GenericArrayData(Array.emptyLongArray)
      // one truncated gram: the whole text (possibly empty)
      return new GenericArrayData(Array(hash(bytes, 0, end, md5Mode)))
    }
    val count = numChars - n + 1
    val out = new Array[Long](count)
    var j = 0
    while (j < count) {
      val from = offs(j)
      val until = if (j + n < numChars) offs(j + n) else end
      out(j) = hash(bytes, from, until - from, md5Mode)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit md5 key (md5Mode) or Spark xxhash64 (seed 42) of a byte
    * slice. */
  def hash(bytes: Array[Byte], off: Int, len: Int, md5Mode: Boolean): Long =
    if (md5Mode) md5Hash60(bytes, off, len)
    else org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, Platform.BYTE_ARRAY_OFFSET + off, len, 42L)

  /** First 60 bits of md5 as a non-negative long — bit-identical to
    * `CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)`. */
  def md5Hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    if (len <= 55) return md5SingleBlock60(bytes, off, len)
    val md = mdLocal.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    firstBits60(d(0), d(1), d(2), d(3), d(4), d(5), d(6), d(7))
  }

  private def firstBits60(b0: Byte, b1: Byte, b2: Byte, b3: Byte,
                          b4: Byte, b5: Byte, b6: Byte, b7: Byte): Long = {
    val top =
      ((b0 & 0xffL) << 56) | ((b1 & 0xffL) << 48) | ((b2 & 0xffL) << 40) |
        ((b3 & 0xffL) << 32) | ((b4 & 0xffL) << 24) | ((b5 & 0xffL) << 16) |
        ((b6 & 0xffL) << 8) | (b7 & 0xffL)
    top >>> 4
  }

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  // RFC 1321 MD5 round constants: K(i) = floor(2^32 * |sin(i + 1)|),
  // the canonical published table (not recomputed — a 1-ulp sin()
  // drift would silently change every digest)
  private val K: Array[Int] = Array(
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)
  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  /** Single-block MD5 (input <= 55 bytes => exactly one 64-byte block
    * after padding), returning the first 60 bits. Zero allocation
    * beyond a thread-local 16-word block buffer. */
  private val blockLocal: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](16))

  private def md5SingleBlock60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val m = blockLocal.get()
    java.util.Arrays.fill(m, 0)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (bytes(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    m(len >> 2) |= 0x80 << ((len & 3) << 3)
    m(14) = len << 3 // bit length, little-endian low word (len < 2^29)

    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    var r = 0
    while (r < 64) {
      var f = 0
      var g = 0
      if (r < 16) { f = (b & c) | (~b & d); g = r }
      else if (r < 32) { f = (d & b) | (~d & c); g = (5 * r + 1) & 15 }
      else if (r < 48) { f = b ^ c ^ d; g = (3 * r + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * r) & 15 }
      val tmp = d
      d = c
      c = b
      val sum = a + f + K(r) + m(g)
      b = b + Integer.rotateLeft(sum, S(r))
      a = tmp
      r += 1
    }
    val h0 = a + 0x67452301
    val h1 = b + 0xefcdab89
    val h2 = c + 0x98badcfe
    val h3 = d + 0x10325476
    // digest bytes are the four state words little-endian; the 60-bit
    // key wants the first 8 digest bytes big-endian >>> 4
    firstBits60(
      h0.toByte, (h0 >>> 8).toByte, (h0 >>> 16).toByte, (h0 >>> 24).toByte,
      h1.toByte, (h1 >>> 8).toByte, (h1 >>> 16).toByte, (h1 >>> 24).toByte)
  }
}

/**
 * Scalar 60-bit md5 key of a whole string:
 * `md5_hash60(x) = CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)`
 * computed digest-direct (same kernel as [[GramHashesExpr]]) — the
 * engine's token-hash primitive without the hex/decimal string
 * round-trips.
 */
case class Md5Hash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "md5_hash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 needs a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Hash60Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60Expr {
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    GramHashesExpr.md5Hash60(bytes, 0, bytes.length)
  }

  def md5Hash60(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Md5Hash60Expr(ColumnBridge.expression(c)))
  }
}

/**
 * SimHash fold over an array of token hashes: for each bit b <
 * `bits`, counts +1/-1 across the array's elements' bit b and sets
 * bit b of the result iff the sum is positive — the exact per-doc
 * arithmetic of the groupBy-with-62-sums formulation it replaces
 * (`sum(when(shiftright(h, b) % 2 === 1, 1).otherwise(-1)) > 0`),
 * collapsed into one loop so the operator needs no explode and no
 * aggregation exchange.
 */
case class SimhashFoldExpr(child: Expression, bits: Int)
  extends UnaryExpression {

  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_fold"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_fold needs array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashFoldExpr.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimhashFoldExpr.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashFoldExpr {
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData,
              bits: Int): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        // arithmetic shift + remainder, exactly like the
        // shiftright(h, b) % 2 === 1 column it replaces (equal for the
        // non-negative token hashes; equal even for negative inputs)
        if ((h >> b) % 2 == 1) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) packed |= 1L << b
      b += 1
    }
    packed
  }

  def simhashFold(c: Column, bits: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimhashFoldExpr(ColumnBridge.expression(c), bits))
  }
}
