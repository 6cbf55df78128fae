package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The concrete flag-bit catalogs for `diasource_extra.flags` and
  * `.pixelflags` — the mapping between the lsst.v10 alert's boolean
  * flag fields and the packed int columns (src/db.py:1793-1837's
  * `_flags_bits` / `_pixelflags_bits`, applied at wrangle time by
  * brokerconsumer.py's `_filter_dict_to_table` path).
  *
  * [[pack]] folds the booleans present on a frame into the int (absent
  * flags contribute 0, like the reference's dict.get default);
  * [[unpack]] re-exposes each bit as its named boolean — both pure
  * column expressions over [[Funcs.packBits]]/[[Funcs.hasAnyBit]], so
  * predicates on single bits stay codegen'd scan-level filters (P6).
  */
object FlagBits {

  /** bit-value → alert boolean name, in bit order. */
  val flagsBits: Seq[(Int, String)] = Seq(
    0x00000001 -> "centroid_flag",
    0x00000002 -> "apFlux_flag",
    0x00000004 -> "apFlux_flag_apertureTruncated",
    0x00000008 -> "isNegative",
    0x00000010 -> "psfFlux_flag",
    0x00000020 -> "psfFlux_flag_edge",
    0x00000040 -> "psfFlux_flag_noGoodPixels",
    0x00000080 -> "trail_flag_edge",
    0x00000100 -> "forced_PsfFlux_flag",
    0x00000200 -> "forced_PsfFlux_flag_edge",
    0x00000400 -> "forced_PsfFlux_flag_noGoodPixels",
    0x00000800 -> "shape_flag",
    0x00001000 -> "shape_flag_no_pixels",
    0x00002000 -> "shape_flag_not_contained",
    0x00004000 -> "shape_flag_parent_source",
    0x00008000 -> "isDipole",
    // "diple" [sic] — the reference's own spelling (db.py:1811); a
    // migrating user's flag queries use THESE names, so do not "fix"
    0x00010000 -> "dipleFitAttempted",
    0x00020000 -> "glint_trail")

  val pixelflagsBits: Seq[(Int, String)] = Seq(
    0x00000001 -> "pixelFlags",
    0x00000002 -> "pixelFlags_bad",
    0x00000004 -> "pixelFlags_cr",
    0x00000008 -> "pixelFlags_crCenter",
    0x00000010 -> "pixelFlags_edge",
    0x00000020 -> "pixelFlags_nodata",
    0x00000040 -> "pixelFlags_nodataCenter",
    0x00000080 -> "pixelFlags_interpolated",
    0x00000100 -> "pixelFlags_interpolatedCenter",
    0x00000200 -> "pixelFlags_offimage",
    0x00000400 -> "pixelFlags_saturated",
    0x00000800 -> "pixelFlags_saturatedCenter",
    0x00001000 -> "pixelFlags_suspect",
    0x00002000 -> "pixelFlags_suspectCenter",
    0x00004000 -> "pixelFlags_streak",
    0x00008000 -> "pixelFlags_streakCenter",
    0x00010000 -> "pixelFlags_injected",
    0x00020000 -> "pixelFlags_injectedCenter",
    0x00040000 -> "pixelFlags_injected_template",
    // "injectedd" [sic] — the reference's spelling (db.py:1836)
    0x00080000 -> "pixelFlags_injectedd_templateCenter")

  /** Pack the catalog's boolean columns (those present on `df`) into
    * one int column; a null boolean packs as 0, like the reference's
    * missing-field default. */
  def pack(df: DataFrame, catalog: Seq[(Int, String)]): Column = {
    val present = catalog.filter { case (_, n) => df.columns.contains(n) }
    if (present.isEmpty) lit(0)
    else present.map { case (bit, n) =>
      when(coalesce(col(n), lit(false)), lit(bit)).otherwise(lit(0))
    }.reduce(_.bitwiseOR(_))
  }

  /** One named boolean column per catalog bit of a packed field. */
  def unpack(field: Column, catalog: Seq[(Int, String)]): Seq[Column] =
    catalog.map { case (bit, n) => Funcs.hasAnyBit(field, bit).as(n) }

  /** Single-bit predicate by flag name (P6 scan-level filter). */
  def flagSet(field: Column, name: String,
      catalog: Seq[(Int, String)]): Column = {
    val bit = catalog.collectFirst { case (b, `name`) => b }
      .getOrElse(throw new IllegalArgumentException(s"unknown flag: $name"))
    Funcs.hasAnyBit(field, bit)
  }
}
