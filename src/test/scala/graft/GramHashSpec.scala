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
