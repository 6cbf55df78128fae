package graft.host

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.merge.SourceImporter

/** Host-galaxy surface: catalog import + object↔host matching
  * (src/services/dr_importer.py:44-78 and the host_galaxy /
  * diaobject_host_match tables, db/2026-02-02_refactor.sql:113-167).
  *
  * The reference loops three UPDATE statements over the
  * `nearbyextobj{1..3}` columns against temp tables; Spark-first this
  * is one unpivot (the three columns become (diaobjectid, prio,
  * host_id) rows) followed by set-operation joins — anti-join for
  * "hosts we don't know yet", semi-join to pull them from the upstream
  * catalog, equi-join to link matches. Prio is 0-high (refactor.sql's
  * COMMENT: 'Sorted from 0 (high) to 32767 (low)'), so nearbyextobj1
  * ranks first.
  */
object HostGalaxy {

  val nearbyCols: Seq[String] =
    Seq("nearbyextobj1", "nearbyextobj2", "nearbyextobj3")

  /** Unpivot the nearbyextobj columns: one (diaobjectid, host_id,
    * prio) row per non-null reference, prio = column index (0 best).
    * The same host referenced from two columns keeps only its BEST
    * prio — duplicate (diaobjectid, host_id) rows would violate the
    * match table's key and double-count n_hosts downstream. */
  def nearbyPairs(objects: DataFrame,
      cols: Seq[String] = nearbyCols): DataFrame =
    cols.zipWithIndex.map { case (c, i) =>
      objects.select(col("diaobjectid"),
        col(c).cast("string").as("host_id"),
        lit(i).cast("smallint").as("prio"))
        .filter(col("host_id").isNotNull)
    }.reduce(_ unionByName _)
      .groupBy("diaobjectid", "host_id")
      .agg(min(col("prio")).cast("smallint").as("prio"))

  /** dr_importer.import_host_info steps 1+2: host ids referenced by
    * objects but absent from host_galaxy are pulled from the upstream
    * catalog (`catalog`: host_id, ra, dec, info) and appended with a
    * deterministic id — the unique (host_catalog, host_id,
    * base_procver_id) key makes replays idempotent. */
  def importHosts(existingHosts: DataFrame, objects: DataFrame,
      catalog: DataFrame, hostCatalog: String, bpv: String,
      cols: Seq[String] = nearbyCols): DataFrame = {
    val wanted = nearbyPairs(objects, cols).select("host_id").distinct()
    val missing = wanted.join(
      existingHosts
        .filter(col("host_catalog") === hostCatalog &&
          col("base_procver_id") === bpv)
        .select("host_id"),
      Seq("host_id"), "left_anti")
    // join on an EXPLICIT string cast of the catalog's native-typed
    // host_id: a string-vs-bigint equi-join would coerce both sides to
    // DOUBLE, and LSST object ids above 2^53 would collide on rounding
    val newHosts = catalog
      .withColumn("host_id", col("host_id").cast("string"))
      .join(missing, Seq("host_id"), "left_semi")
      .select(
        SourceImporter.deterministicUuid(
          lit(hostCatalog), col("host_id"), lit(bpv)).as("id"),
        lit(hostCatalog).as("host_catalog"),
        col("host_id"),
        lit(bpv).as("base_procver_id"),
        col("ra"), col("dec"), col("info"))
    existingHosts.unionByName(newHosts)
  }

  /** dr_importer step 3 (the nearbyextobj{i}id backfill), as
    * diaobject_host_match rows: every non-null nearby reference that
    * resolves against host_galaxy becomes a prio-ranked match. */
  def matchHosts(objects: DataFrame, hosts: DataFrame,
      hostCatalog: String, bpv: String,
      cols: Seq[String] = nearbyCols): DataFrame =
    nearbyPairs(objects, cols)
      .join(hosts
        .filter(col("host_catalog") === hostCatalog &&
          col("base_procver_id") === bpv)
        .select(col("host_id"), col("id").as("host_galaxy_id")),
        Seq("host_id"))
      .select(col("diaobjectid"), col("host_galaxy_id"),
        lit(bpv).as("base_procver_id"), col("prio"))

  /** Best (lowest prio) host per object, with host info attached — the
    * ltcvapp `include_hostinfo` join shape. A1-shaped argmax: a
    * partial-aggregating min_by over (prio, host id), not a window
    * sort, so map-side combine bounds the shuffle at any object
    * count. */
  def bestHost(matches: DataFrame, hosts: DataFrame): DataFrame =
    matches.groupBy("diaobjectid", "base_procver_id")
      .agg(min_by(struct(col("host_galaxy_id"), col("prio")),
        struct(col("prio"), col("host_galaxy_id"))).as("_b"),
        count(lit(1)).cast("long").as("n_hosts"))
      .select(col("diaobjectid"), col("base_procver_id"),
        col("_b.host_galaxy_id").as("host_galaxy_id"),
        col("_b.prio").as("prio"), col("n_hosts"))
      .join(hosts.select(col("id").as("host_galaxy_id"), col("host_id"),
        col("ra").as("host_ra"), col("dec").as("host_dec"), col("info")),
        Seq("host_galaxy_id"))
}
