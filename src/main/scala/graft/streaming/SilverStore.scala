package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.merge.SourceImporter.ImportResult
import graft.schema.Schemas

/** Parquet-backed persistence for the silver catalog tables, with
  * write-to-temp + directory-swap so a reader never sees a half-written
  * table. Stand-in for a transactional format (Delta `MERGE` in a real
  * deployment); the swap is the only non-Delta-shaped piece, and it is
  * confined here.
  */
final class SilverStore(baseDir: String) {

  private val tables = Seq(
    "root_diaobject" -> Schemas.rootDiaObject,
    "diaobject" -> Schemas.diaObject,
    "diasource" -> Schemas.diaSource,
    "diaforcedsource" -> Schemas.diaForcedSource,
    "diaobject_position" -> Schemas.diaObjectPosition,
    "diasource_extra" -> Schemas.diaSourceExtra,
    "diaforcedsource_extra" -> Schemas.diaForcedSourceExtra,
    "diasource_brokerinfo" -> Schemas.diaSourceBrokerInfo,
    "thumbnails" -> Schemas.thumbnails).toMap

  private def dir(name: String): Path = Paths.get(baseDir, name)

  private def nonEmptyDir(p: Path): Boolean = {
    if (!Files.exists(p)) return false
    val s = Files.list(p)
    try s.findFirst().isPresent finally s.close()
  }

  private def readOrEmpty(spark: SparkSession, name: String): DataFrame =
    if (nonEmptyDir(dir(name)))
      spark.read.parquet(dir(name).toString)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        tables(name))

  def load(spark: SparkSession): ImportResult = ImportResult(
    readOrEmpty(spark, "root_diaobject"),
    readOrEmpty(spark, "diaobject"),
    readOrEmpty(spark, "diasource"),
    readOrEmpty(spark, "diaforcedsource"),
    readOrEmpty(spark, "diaobject_position"),
    readOrEmpty(spark, "diasource_extra"),
    readOrEmpty(spark, "diaforcedsource_extra"),
    readOrEmpty(spark, "diasource_brokerinfo"),
    readOrEmpty(spark, "thumbnails"))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))

  /** Persist all four tables. The merged plans lazily read the *live*
    * dirs, so every temp write must execute before any swap — swapping
    * as we go would make a later plan re-read an already-replaced
    * table (or hit missing files). Two phases: write all, then swap
    * all. */
  def save(r: ImportResult): Unit = {
    val dfs = Seq("root_diaobject" -> r.rootDiaobject, "diaobject" -> r.diaobject,
      "diasource" -> r.diasource, "diaforcedsource" -> r.diaforcedsource,
      "diaobject_position" -> r.diaobjectPosition,
      "diasource_extra" -> r.diasourceExtra,
      "diaforcedsource_extra" -> r.diaforcedsourceExtra,
      "diasource_brokerinfo" -> r.brokerinfo,
      "thumbnails" -> r.thumbnails)
    dfs.foreach { case (name, df) =>
      val tmp = Paths.get(baseDir, s"_tmp_$name")
      deleteRecursively(tmp)
      df.write.parquet(tmp.toString)
    }
    dfs.foreach { case (name, _) =>
      val live = dir(name)
      deleteRecursively(live)
      Files.move(Paths.get(baseDir, s"_tmp_$name"), live)
    }
  }
}
