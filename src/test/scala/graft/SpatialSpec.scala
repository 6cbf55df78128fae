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

  test("z-order key interleaves bits exactly as the reference Morton code") {
    import graft.spatial.ZOrder
    def morton(qx: Long, qy: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((qx >> i) & 1L) << (2 * i)) | (((qy >> i) & 1L) << (2 * i + 1))).sum
    val bits = 8
    val cells = 1 << bits
    // sample of coordinates incl. domain corners and out-of-range clamps
    val rng = new scala.util.Random(31)
    val coords = Seq((0.0, -90.0), (359.999, 89.999), (-5.0, 95.0),
      (180.0, 0.0)) ++ Seq.fill(200)((rng.nextDouble() * 360, rng.nextDouble() * 180 - 90))
    val got = coords.zipWithIndex
      .map { case ((ra, dec), i) => (i.toLong, ra, dec) }
      .toDF("id", "ra", "dec")
      .withColumn("z", ZOrder.skyKey(col("ra"), col("dec"), bits))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    coords.zipWithIndex.foreach { case ((ra, dec), i) =>
      def q(v: Double, lo: Double, hi: Double) =
        math.min(math.max(math.floor((v - lo) / (hi - lo) * cells), 0), cells - 1).toLong
      assert(got(i.toLong) == morton(q(ra, 0, 360), q(dec, -90, 90), bits),
        s"coord ($ra, $dec)")
    }
  }

  test("z-order layout gives files tight boxes; a box query touches few files") {
    import graft.spatial.ZOrder
    val rng = new scala.util.Random(7)
    val pts = (0L until 20000L)
      .map(i => (i, rng.nextDouble() * 360, rng.nextDouble() * 180 - 90))
      .toDF("id", "ra", "dec")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.layout(pts, "ra", "dec", numFiles = 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    pts.repartition(16, col("id")) // the layout you get without thinking
      .write.mode("overwrite").parquet(s"$dir/naive")
    def boxes(p: String) = ZOrder.fileBoxes(spark, p, "ra", "dec").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val z = boxes(s"$dir/z")
    val naive = boxes(s"$dir/naive")
    // z-order: mean fractional box area near 1/numFiles; naive: ~full sky
    val zArea = z.map(_._5).sum / z.length
    val nArea = naive.map(_._5).sum / naive.length
    assert(zArea < 0.2, s"z-order mean box area $zArea")
    assert(nArea > 0.8, s"naive layout should span the domain, got $nArea")
    // a 20°x20° box query: count files whose box intersects
    def touches(bs: Array[(Double, Double, Double, Double, Double)]) =
      bs.count { case (rmin, rmax, dmin, dmax, _) =>
        rmax >= 100 && rmin <= 120 && dmax >= 10 && dmin <= 30 }
    assert(touches(z) <= z.length / 2, s"z touches ${touches(z)} of ${z.length}")
    assert(touches(naive) == naive.length, "naive touches every file")
  }
}
