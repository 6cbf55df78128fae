package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.stats.GoldTables
import graft.query.{Ltcv, ObjectSearch}

class GoldTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val cat = FixtureWorld.catalog(spark)

  test("objstats gold tables refresh + object search over them (§3.4)") {
    val out = Files.createTempDirectory("gold").toString
    GoldTables.refreshObjStats(cat, "pvid-pv1", out)

    val perBand = GoldTables.objStats(spark, out, "pvid-pv1", Some("r"))
    assert(perBand.count() > 0)
    assert(perBand.filter(col("band") =!= "r").count() == 0)

    val comb = GoldTables.objStats(spark, out, "pvid-pv1")
    // weighted positions joined for cone search
    assert(comb.columns.contains("ra") && comb.columns.contains("dec"))

    // predicate-spec search on the gold table matches a manual filter
    val got = ObjectSearch.search(comb, Map("ndets_min" -> 10))
      .select("rootid").collect().map(_.getString(0)).toSet
    val want = comb.filter(col("ndets") >= 10)
      .select("rootid").collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty)

    // cone search narrowed to the two close roots of the fixture world
    val cone = ObjectSearch.search(comb, Map(), Some((42.0, 13.0, 15.0)))
      .select("rootid").collect().map(_.getString(0)).toSet
    assert(cone == Set("root-0", "root-1"))
  }

  test("S7 lightcurve parquet export: mjd-ordered record arrays per root") {
    val out = Files.createTempDirectory("ltcvexp").toString
    GoldTables.exportLtcvs(cat, "pvid-pv3", out)
    val df = spark.read.parquet(out)
    assert(df.count() == 4)
    val row = df.filter(col("rootid") === "root-0").head()
    val arr = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("ltcv"))
    assert(arr.nonEmpty && row.getAs[Long]("nobs") == arr.size)
    val mjds = arr.map(_.getAs[Double]("mjd"))
    assert(mjds == mjds.sorted, "lightcurve array must be mjd-ordered")

    // constant-flag exports follow patchJoin's semantics: a detections
    // export is all detection fluxes (isdet, ispatch both true), a
    // forced export is all forced photometry (both false)
    val detDir = Files.createTempDirectory("ltcvdet").toString
    GoldTables.exportLtcvs(cat, "pvid-pv3", detDir, whichPhot = "detections")
    val det = spark.read.parquet(detDir)
      .select(explode(col("ltcv")).as("p")).select("p.isdet", "p.ispatch")
    assert(det.count() > 0 &&
      det.filter(!col("isdet") || !col("ispatch")).count() == 0)
    val forDir = Files.createTempDirectory("ltcvfor").toString
    GoldTables.exportLtcvs(cat, "pvid-pv3", forDir, whichPhot = "forced")
    val for_ = spark.read.parquet(forDir)
      .select(explode(col("ltcv")).as("p")).select("p.isdet", "p.ispatch")
    assert(for_.count() > 0 &&
      for_.filter(col("isdet") || col("ispatch")).count() == 0)
  }
}
