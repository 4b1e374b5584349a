package graft

import graft.geo.H3Lite
import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * SparkSessionExtensions surface: the custom codegen'd kernels are
 * callable by name from `spark.sql`, with the same results as the
 * Column API (which other specs gate against the oracle).
 */
class ExtensionsSpec extends AnyFunSuite {

  private def withExtSession[T](body: SparkSession => T): T = {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try body(s)
    finally {
      // hand the shared JVM back exactly as found: other suites'
      // lazy getOrCreate must not inherit this session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("h3lite_encode is callable from SQL and matches the kernel") {
    withExtSession { s =>
      val got = s.sql(
        "SELECT h3lite_encode(1000000, 2000000, 7) AS c").collect()(0).getLong(0)
      assert(got === H3Lite.encode(1000000, 2000000, 7))
      // parity with the Column API over a value table
      val rows = s.sql(
        """SELECT lat, lon,
          |       h3lite_encode(lat, lon, 5) AS via_sql
          |FROM VALUES (-100000L, 250000L), (0L, 0L), (8388607L, -8388608L)
          |  AS t(lat, lon)""".stripMargin).collect()
      rows.foreach { r =>
        assert(r.getLong(2) ===
          H3Lite.encode(r.getLong(0).toInt, r.getLong(1).toInt, 5))
      }
    }
  }

  test("dot_f64 is callable from SQL, bit-exact, null on length mismatch") {
    withExtSession { s =>
      val v = s.sql(
        "SELECT dot_f64(array(1.5d, 2.0d, -3.0d), array(2.0d, 0.5d, 1.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(v === (1.5 * 2.0 + 2.0 * 0.5 + (-3.0) * 1.0))
      val mismatch = s.sql(
        "SELECT dot_f64(array(1.0d), array(1.0d, 2.0d)) AS d").collect()(0)
      assert(mismatch.isNullAt(0))
    }
  }

  test("bad resolution argument is rejected at analysis") {
    withExtSession { s =>
      val e = intercept[Exception](
        s.sql("SELECT h3lite_encode(1, 2, lat) FROM VALUES (1L) AS t(lat)")
          .collect())
      assert(e.getMessage.contains("resolution") ||
        e.getMessage.contains("h3lite_encode"))
    }
  }
}
