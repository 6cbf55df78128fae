package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.spatial.Spatial
import graft.functions.Funcs

class SpatialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def sepArcsec(ra1: Double, dec1: Double, ra2: Double, dec2: Double): Double = {
    val (r1, d1, r2, d2) = (math.toRadians(ra1), math.toRadians(dec1),
      math.toRadians(ra2), math.toRadians(dec2))
    val a = math.pow(math.sin((d2 - d1) / 2), 2) +
      math.cos(d1) * math.cos(d2) * math.pow(math.sin((r2 - r1) / 2), 2)
    math.toDegrees(2 * math.asin(math.sqrt(a))) * 3600.0
  }

  val pts: Seq[(Long, Double, Double)] = Seq(
    (0L, 42.0, 13.0), (1L, 42.0, 13.0036), (2L, 42.0, 13.0056), (3L, 42.0, 14.0),
    (4L, 359.99995, -5.0), (5L, 0.00005, -5.0),   // RA wraparound pair (~0.36″)
    (6L, 10.0, 89.9999), (7L, 190.0, 89.9999),    // polar pair (~0.7″ through the pole)
    // high-dec pairs just inside the radius: the naive r/cos(dec) RA
    // prefilter drops these (regression for the exact 2*asin bound)
    (8L, 10.0, 89.0), (9L, 10.0 + 7.0499, 89.0),   // sep ≈ 442.6″ at 15″... scaled below
    (10L, 50.0, 85.0), (11L, 50.0 + 0.0475, 85.0)) // sep ≈ 14.9″ at dec 85

  test("J6 cone join matches brute force, incl. RA wrap and pole") {
    val df = pts.toDF("id", "ra", "dec")
    val right = pts.toDF("rid", "rra", "rdec")
    for (radius <- Seq(1.0, 8.0, 15.0, 25.0)) {
      val got = Spatial.coneJoin(df, right, "ra", "dec", "rra", "rdec", radius)
        .filter(col("id") < col("rid"))
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (i, ra1, dec1) <- pts; (j, ra2, dec2) <- pts if i < j
        if sepArcsec(ra1, dec1, ra2, dec2) <= radius
      } yield (i, j)).toSet
      assert(got == want, s"radius $radius")
    }
  }

  test("cone search around a point (q3c_radial_query semantics)") {
    val df = pts.toDF("id", "ra", "dec")
    val got = Spatial.coneSearch(df, "ra", "dec", 42.0, 13.0, 15.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L))   // 12.96″ in, 20.16″ out
  }

  test("T7 root crossmatch: nearest root within 1″, null on miss") {
    val roots = Seq(("root-a", 42.0, 13.0), ("root-b", 42.0, 13.0004))
      .toDF("id", "ra", "dec")
    val newObjs = Seq(
      (1L, 42.0, 13.00005),   // 0.18″ from root-a, 1.26″ from root-b → root-a
      (2L, 42.0, 13.00038),   // 0.07″ from root-b → root-b
      (3L, 42.0, 13.01)       // no match
    ).toDF("diaobjectid", "ra", "dec")
    val got = Spatial.crossmatchRoots(newObjs, "diaobjectid", roots, 1.0)
      .select("diaobjectid", "rootid").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("root-a"), 2L -> Some("root-b"), 3L -> None))
  }

  test("haversine column matches scalar to 1e-9 arcsec") {
    val df = Seq((42.0, 13.0, 42.0, 13.0036)).toDF("ra1", "dec1", "ra2", "dec2")
    val got = df.select((Funcs.greatCircleDeg(col("ra1"), col("dec1"),
      col("ra2"), col("dec2")) * 3600).as("s")).head().getDouble(0)
    assert(math.abs(got - sepArcsec(42.0, 13.0, 42.0, 13.0036)) < 1e-9)
  }
}
