package graft.ingest

import org.apache.spark.sql.DataFrame

/** The three silver-shaped tables every batch loader produces — one
  * shared shape, so SNANA- and DP1-loaded catalogs are interchangeable
  * downstream (the two loaders MUST stay column-compatible; see the
  * null astrometric-error columns both emit on diasource). */
final case class Loaded(diaobject: DataFrame, diasource: DataFrame,
    diaforcedsource: DataFrame)
