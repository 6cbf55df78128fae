package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Funcs
import graft.query.{FieldSpec, SearchSpec}

class FuncsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F1 flux↔mag roundtrip at ZP 31.4 (ltcv.py:1590-1595)") {
    val df = Seq(912.010839, 2290.867653, 5754.399373, 14454.397707).toDF("flux")
    val mags = df.select(Funcs.flux2mag(col("flux")).as("m")).collect().map(_.getDouble(0))
    assert(mags.zip(Seq(24.0, 23.0, 22.0, 21.0)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    val back = df.select(Funcs.mag2flux(Funcs.flux2mag(col("flux"))).as("f"))
      .collect().map(_.getDouble(0))
    assert(back.zip(Seq(912.010839, 2290.867653, 5754.399373, 14454.397707))
      .forall { case (a, b) => math.abs(a - b) / b < 1e-9 })
  }

  test("F2 SNANA ZP rescale (load_snana_fits.py:185-186)") {
    val got = Seq((100.0, 27.5)).toDF("flux", "zp")
      .select(Funcs.snanaZpRescale(col("flux"), col("zp")).as("f")).head().getDouble(0)
    assert(math.abs(got - 100.0 * math.pow(10, (31.4 - 27.5) / 2.5)) < 1e-9)
  }

  test("F3 visit synthesis = floor(mjd*20000) (load_snana_fits.py:208)") {
    val got = Seq(60000.12345).toDF("mjd")
      .select(Funcs.visitOf(col("mjd")).as("v")).head().getLong(0)
    assert(got == math.floor(60000.12345 * 20000).toLong)
  }

  test("F8 flag catalogs: pack/unpack round-trip, missing fields pack as 0") {
    import graft.functions.FlagBits
    val df = Seq((true, false, true), (false, true, false))
      .toDF("centroid_flag", "psfFlux_flag", "glint_trail")
    val packed = df.select(FlagBits.pack(df, FlagBits.flagsBits).as("flags"))
    val vals = packed.collect().map(_.getInt(0))
    assert(vals(0) == (0x1 | 0x20000))      // centroid + glint_trail
    assert(vals(1) == 0x10)                 // psfFlux_flag only
    // unpack restores exactly the packed booleans
    val un = packed.select(FlagBits.unpack(col("flags"), FlagBits.flagsBits): _*)
      .collect()
    assert(un(0).getAs[Boolean]("centroid_flag") && un(0).getAs[Boolean]("glint_trail"))
    assert(!un(0).getAs[Boolean]("psfFlux_flag") && un(1).getAs[Boolean]("psfFlux_flag"))
    // named single-bit predicate
    val n = packed.filter(FlagBits.flagSet(col("flags"), "glint_trail",
      FlagBits.flagsBits)).count()
    assert(n == 1)
    // a frame carrying none of the catalog booleans packs to zero
    val none = Seq(Tuple1(1)).toDF("x")
    assert(none.select(FlagBits.pack(none, FlagBits.pixelflagsBits)).head().getInt(0) == 0)
  }

  test("F4 MJD ↔ timestamp (epoch 40587) round-trips at microsecond precision") {
    // 60000.5 + 1.234567 s: a whole-second truncation would lose the
    // fractional second (~1.4e-5 mjd) outright
    val m0 = 60000.5 + 1.234567 / 86400.0
    val mjd = Seq(m0).toDF("mjd")
    val ts = mjd.select(Funcs.mjdToTimestamp(col("mjd")).as("t"))
    val back = ts.select(Funcs.timestampToMjd(col("t")).as("m")).head().getDouble(0)
    assert(math.abs(back - m0) < 1e-6 / 86400.0,
      s"round-trip error ${math.abs(back - m0) * 86400.0} s exceeds 1 us")
    val unix = mjd.select(Funcs.mjdToUnix(col("mjd")).as("u")).head().getDouble(0)
    assert(math.abs(unix - (m0 - 40587.0) * 86400.0) < 1e-9)
  }

  test("F6 sexagesimal parse (util.py:326-374)") {
    assert(math.abs(Funcs.parseSexagesimal("12:30:36") - 12.51) < 1e-9)
    assert(math.abs(Funcs.parseSexagesimal("-00:30:00") - (-0.5)) < 1e-9)
    assert(math.abs(Funcs.parseSexagesimal("01:00:00", hours = true) - 15.0) < 1e-9)
    intercept[IllegalArgumentException](Funcs.parseSexagesimal("12:30"))
  }

  test("F8/P6 bitfield pack + test (brokerconsumer.py:453-461)") {
    val df = Seq((true, false, true)).toDF("a", "b", "c")
    val packed = df.select(Funcs.packBits(Seq(
      (col("a"), 0), (col("b"), 1), (col("c"), 4))).as("flags")).head().getInt(0)
    assert(packed == ((1 << 0) | (1 << 4)))
    val hit = df.select(Funcs.hasAnyBit(lit(packed), 1 << 4).as("h")).head().getBoolean(0)
    assert(hit)
  }

  test("F15 priority clamp to [0,5] (spectrumapp.py:61-63)") {
    val got = Seq(-3, 2, 9).toDF("p")
      .select(Funcs.clampPriority(col("p")).as("c")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 2, 5))
  }

  test("P1 predicate builder: equality, lists, contains, minmax, difference (db.py:463-577)") {
    val spec = SearchSpec(Map(
      "a" -> FieldSpec(minmax = true), "b" -> FieldSpec(minmax = true),
      "name" -> FieldSpec(mult = true, substr = true)))
    val df = Seq((1.0, 5.0, "alpha"), (10.0, 2.0, "beta"), (7.0, 7.0, "gamma"))
      .toDF("a", "b", "name")
    def ids(args: Map[String, Any]) =
      df.filter(spec.buildPredicate(args)).select("name").collect().map(_.getString(0)).toSet
    assert(ids(Map("a_min" -> 5)) == Set("beta", "gamma"))
    assert(ids(Map("a_min" -> 5, "a_max" -> 8)) == Set("gamma"))
    assert(ids(Map("name" -> "beta")) == Set("beta"))
    assert(ids(Map("name" -> Seq("alpha", "beta"))) == Set("alpha", "beta"))
    assert(ids(Map("name_contains" -> "mm")) == Set("gamma"))
    assert(ids(Map("name_contains" -> Seq("lph", "et"))) == Set("alpha", "beta"))
    assert(ids(Map("a_minus_b_min" -> 1)) == Set("beta"))       // a-b >= 1
    assert(ids(Map("a_minus_b_max" -> 0)) == Set("alpha", "gamma"))
    intercept[IllegalArgumentException](ids(Map("zzz" -> 1)))
    intercept[IllegalArgumentException](ids(Map("a_contains" -> "x")))
  }
}
