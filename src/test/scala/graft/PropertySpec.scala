package graft

import graft.geo.{H3Lite, MapUnits, RectAlgebra, TileRect}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class PropertySpec extends AnyFunSuite {

  /** run a scalacheck property under scalatest without the
    * scalatestplus bridge (not in the offline dependency cache) */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val latGen = Gen.choose(-(1 << 23), (1 << 23) - 1)
  private val lonGen = Gen.choose(-(1 << 23), (1 << 23) - 1)

  test("property: roundDown/roundUp bracket every value at every shift") {
    check(Prop.forAll(Gen.choose(-(1 << 23), 1 << 23), Gen.choose(1, 16)) { (v, s) =>
      val d = MapUnits.roundDown(v, s)
      val u = MapUnits.roundUp(v, s)
      d % (1 << s) == 0 && u % (1 << s) == 0 && d <= v && v <= u &&
        v - d < (1 << s) && u - v < (1 << s)
    })
  }

  test("property: toMapUnit/toDegrees round trip within half a unit") {
    check(Prop.forAll(Gen.choose(-85.0, 85.0)) { deg =>
      val mu = MapUnits.toMapUnit(deg)
      math.abs(MapUnits.toDegrees(mu) - deg) <= 360.0 / (1 << 24)
    })
  }

  private val rectGen: Gen[TileRect] = for {
    lat <- Gen.choose(-1000000, 1000000)
    lon <- Gen.choose(-1000000, 1000000)
    h <- Gen.choose(1, 500000)
    w <- Gen.choose(1, 500000)
  } yield TileRect(lat, lon, lat + h, lon + w)

  test("property: rect intersection is commutative and contained") {
    check(Prop.forAll(rectGen, rectGen) { (a, b) =>
      val i1 = a.intersection(b)
      val i2 = b.intersection(a)
      i1 == i2 && i1.forall(r => a.containsRect(r) && b.containsRect(r))
    })
  }

  test("property: overlaps implies intersects; union contains both") {
    check(Prop.forAll(rectGen, rectGen) { (a, b) =>
      (!a.overlaps(b) || a.intersects(b)) &&
        a.union(b).containsRect(a) && a.union(b).containsRect(b)
    })
  }

  test("property: nonOverlapping output is pairwise disjoint and covers inputs' corners") {
    val rectsGen = Gen.nonEmptyListOf(rectGen).map(_.take(8))
    check(Prop.forAll(rectsGen) { rects =>
      val d = RectAlgebra.nonOverlapping(rects)
      val disjoint = d.indices.forall(i =>
        (i + 1 until d.size).forall(j => !d(i).overlaps(d(j))))
      // interior sample of every input rect stays covered
      val covered = rects.forall { r =>
        val (la, lo) = (r.minLat, r.minLon) // half-open corner
        d.exists(t => la >= t.minLat && la < t.maxLat && lo >= t.minLon && lo < t.maxLon)
      }
      disjoint && covered
    })
  }

  test("property: h3lite encode/decode/parent consistency") {
    check(Prop.forAll(latGen, lonGen, Gen.choose(1, 24)) { (lat, lon, res) =>
      val cell = H3Lite.encode(lat, lon, res)
      val (dLat, dLon) = H3Lite.decode(cell)
      val sz = H3Lite.cellSize(res)
      val inCell = dLat <= lat && lat < dLat + sz && dLon <= lon && lon < dLon + sz
      val parentOk = (0 to res).forall(p =>
        H3Lite.parent(cell, p) == H3Lite.encode(lat, lon, p))
      inCell && parentOk
    })
  }

  test("property: coordinate synthesis is total and in-window") {
    check(Prop.forAll(Gen.choose(0L, 1000000000L)) { id =>
      val (lat, lon) = graft.geo.CoordSynthesis.latLonOf(id)
      lat >= graft.geo.CoordSynthesis.LatMin && lat < graft.geo.CoordSynthesis.LatMax &&
        lon >= graft.geo.CoordSynthesis.LonMin && lon < graft.geo.CoordSynthesis.LonMax
    })
  }
}
