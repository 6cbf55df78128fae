package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P1 — the generic predicate builder (src/db.py:463-577).
  *
  * A search spec declares, per field, which predicate kinds are legal;
  * the caller passes loosely-typed kwargs exactly like the reference's
  * web API:
  *
  *   field            -> field = v          (or field IN (vs) if mult)
  *   field_contains   -> field LIKE '%v%'   (OR-of-list if a Seq)
  *   field_min        -> field >= v
  *   field_max        -> field <= v
  *   a_minus_b_min    -> a - b >= v         (difference predicate, J9)
  *   a_minus_b_max    -> a - b <= v
  *
  * Unknown fields / disallowed kinds throw, mirroring the reference's
  * validation. Everything compiles to Column expressions, so Catalyst
  * pushes the conjunction into the scan.
  */
final case class FieldSpec(
    mult: Boolean = false,
    substr: Boolean = false,
    minmax: Boolean = false)

final case class SearchSpec(fields: Map[String, FieldSpec]) {

  private val MinusRe = "^(.+)_minus_(.+?)_(min|max)$".r

  def buildPredicate(args: Map[String, Any]): Column =
    args.toSeq.sortBy(_._1).map { case (k, v) => one(k, v) }
      .foldLeft(lit(true))(_ && _)

  private def spec(field: String): FieldSpec =
    fields.getOrElse(field,
      throw new IllegalArgumentException(s"unknown search field: $field"))

  private def one(key: String, value: Any): Column = key match {
    case MinusRe(a, b, dir) if fields.contains(a) && fields.contains(b) =>
      require(spec(a).minmax && spec(b).minmax,
        s"difference predicate not allowed on $a/$b")
      val d = col(a) - col(b)
      if (dir == "min") d >= lit(value) else d <= lit(value)
    case k if k.endsWith("_min") && fields.contains(k.dropRight(4)) =>
      val f = k.dropRight(4)
      require(spec(f).minmax, s"min/max not allowed on $f")
      col(f) >= lit(value)
    case k if k.endsWith("_max") && fields.contains(k.dropRight(4)) =>
      val f = k.dropRight(4)
      require(spec(f).minmax, s"min/max not allowed on $f")
      col(f) <= lit(value)
    case k if k.endsWith("_contains") && fields.contains(k.dropRight(9)) =>
      val f = k.dropRight(9)
      require(spec(f).substr, s"substring not allowed on $f")
      value match {
        case vs: Seq[_] => vs.map(v => col(f).contains(lit(v)))
          .foldLeft(lit(false))(_ || _)
        case v => col(f).contains(lit(v))
      }
    case k if fields.contains(k) =>
      value match {
        case vs: Seq[_] =>
          require(spec(k).mult, s"list values not allowed on $k")
          col(k).isin(vs.map(_.asInstanceOf[AnyRef]): _*)
        case v => col(k) === lit(v)
      }
    case other =>
      throw new IllegalArgumentException(s"unparseable search key: $other")
  }
}

object ObjectSearch {

  /** The 20 objstats search fields (src/ltcv.py:1206-1254): all
    * min/max-able numerics plus exact-match ids. */
  val objStatsSpec: SearchSpec = SearchSpec(
    Map("rootid" -> FieldSpec(mult = true), "band" -> FieldSpec(mult = true)) ++
    Seq("ndets", "firstdetmjd", "firstdetflux", "firstdetfluxerr",
      "lastdetmjd", "lastdetflux", "lastdetfluxerr",
      "maxdetmjd", "maxdetflux", "maxdetfluxerr",
      "ndets24", "ndets23", "ndets22", "ndets21",
      "nsn10", "nsn7", "nsn5")
      .map(_ -> FieldSpec(minmax = true)).toMap)

  /** §3.4 object search: predicate-spec filter over the objstats gold
    * table, optionally narrowed by a cone (src/ltcv.py:1060-1287).
    * Positions come from the caller-joined ra/dec columns. */
  def search(stats: DataFrame, args: Map[String, Any],
      cone: Option[(Double, Double, Double)] = None): DataFrame = {
    val filtered = stats.filter(objStatsSpec.buildPredicate(args))
    cone match {
      case Some((ra0, dec0, radiusArcsec)) =>
        graft.spatial.Spatial.coneSearch(filtered, "ra", "dec", ra0, dec0, radiusArcsec)
      case None => filtered
    }
  }
}
