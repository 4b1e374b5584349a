package graft

import graft.functions.{GramHashesExpr, Md5Hash60Expr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/**
 * Round-7 optimization gate: the fused gram-hash kernels must be
 * BIT-IDENTICAL to the builtin formulations they replace — same
 * 60-bit md5 values as `conv(substring(md5(g), 1, 15), 16, 10)`,
 * same xxhash64 values as the builtin `xxhash64(substring(...))`,
 * same gram positions as `explode(sequence(1, greatest(len - (n-1),
 * 1)))` including the truncated-gram and empty-text edge cases.
 */
class GramHashSpec extends AnyFunSuite {

  private def withSession[T](body: SparkSession => T): T = {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try body(s)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  /** Random texts hitting every edge: empty, shorter than n, exactly
    * n, multibyte code points (2- and 3-byte UTF-8), long repeats. */
  private def sampleTexts(rnd: Random): Seq[String] = {
    val alphabets = Seq(
      "abc def ".toSeq.map(_.toString),
      "aé漢 z".toSeq.map(_.toString),
      ('a' to 'z').map(_.toString) ++ Seq(" "))
    val randoms = (0 until 60).map { i =>
      val alpha = alphabets(i % alphabets.size)
      val len = rnd.nextInt(80)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.size))).mkString
    }
    Seq("", "a", "é", "漢", "ab", "abcdefghijklm",
      "x" * 55, "x" * 56, "y" * 200) ++ randoms
  }

  test("md5_hash60 matches conv(substring(md5, 1, 15), 16, 10)") {
    withSession { s =>
      import s.implicits._
      val rnd = new Random(7)
      val df = sampleTexts(rnd).toDF("t")
      val rows = df.select(
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("ref"),
        Md5Hash60Expr.md5Hash60(col("t")).as("got")).collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    }
  }

  for (mode <- Seq("md5", "xxhash64"); n <- Seq(1, 3, 13, 20)) {
    test(s"gram_hashes($mode, n=$n) == builtin explode+substring+hash") {
      withSession { s =>
        import s.implicits._
        val rnd = new Random(n * 31 + mode.hashCode)
        val df = sampleTexts(rnd).zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
          .localCheckpoint(true)
        def builtinHash(c: org.apache.spark.sql.Column) = mode match {
          case "md5" => conv(substring(md5(c), 1, 15), 16, 10).cast("long")
          case _ => xxhash64(c)
        }
        val ref = df.select(col("id"), col("t"),
            explode(sequence(lit(1), greatest(length(col("t")) - (n - 1), lit(1))))
              .as("i"))
          .select(col("id"), col("i").cast("long").as("i"),
            substring(col("t"), col("i"), lit(n)).as("gram"))
          .select(col("id"), col("i"), builtinHash(col("gram")).as("h"),
            (length(col("gram")) === n).as("full"))
        val got = df.select(col("id"),
            posexplode(GramHashesExpr.gramHashes(col("t"), n, mode,
              fullOnly = false)).as(Seq("p", "h")))
          .select(col("id"), (col("p") + 1).cast("long").as("i"), col("h"))
        val refAll = ref.select("id", "i", "h").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val gotAll = got.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(gotAll === refAll)
        // fullOnly drops exactly the rows the length filter drops
        val refFull = ref.where(col("full")).select("id", "h").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val gotFull = df.select(col("id"),
            explode(GramHashesExpr.gramHashes(col("t"), n, mode,
              fullOnly = true)).as("h"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(gotFull === refFull)
      }
    }
  }

  test("single-block md5 kernel matches MessageDigest on 50k random slices") {
    // pure-JVM fuzz of the RFC-1321 fast path: every length 0..59
    // (crossing the 55-byte single-block boundary into the
    // MessageDigest fallback), random offsets, random bytes
    val rnd = new Random(20260822)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < 50000) {
      val len = i % 60
      val off = rnd.nextInt(5)
      val buf = new Array[Byte](off + len + rnd.nextInt(3))
      rnd.nextBytes(buf)
      val got = GramHashesExpr.md5Hash60(buf, off, len)
      md.reset(); md.update(buf, off, len)
      val d = md.digest()
      val top = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      assert(got === top, s"md5 kernel diverges at len=$len off=$off")
      i += 1
    }
  }

  test("null text yields null (no rows after explode), like the builtins") {
    withSession { s =>
      import s.implicits._
      val df = Seq((1L, null: String), (2L, "abcd")).toDF("id", "t")
      val got = df.select(col("id"),
        explode(GramHashesExpr.gramHashes(col("t"), 3, "md5",
          fullOnly = false)).as("h"))
      assert(got.collect().map(_.getLong(0)).toSeq === Seq(2L, 2L))
      assert(df.select(Md5Hash60Expr.md5Hash60(col("t"))).collect()
        .head.isNullAt(0))
    }
  }
}
