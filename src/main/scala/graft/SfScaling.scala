package graft

import java.io.File
import java.nio.file.Files

/** Per-query scale-factor scaling smoke: `runMain graft.SfScaling
  * [query,query,...]` runs each query at sf0.001, sf0.01 AND sf0.1
  * in solo child JVMs (the [[Bench]] fork/isolation machinery, so
  * chunk co-tenancy can't distort the ratio) and FITS a per-query
  * scaling exponent from the points where the query's input actually
  * grows.
  *
  * Why three points and a fit, not one ratio: a single 10× ratio of
  * 2.2–2.5 cannot distinguish "constant-dominated" (fixed Spark
  * overhead + a linear term that hasn't taken over yet) from
  * "genuinely superlinear" — the two have very different 100 TB
  * futures. With three points, log-time vs log-data slope separates
  * them: constant-dominated queries fit e ≪ 1, linear ones e ≈ 1,
  * and anything with e > 1.2 is flagged as a finding.
  *
  * The fit is INPUT-FAMILY-AWARE because the driver's test data does
  * not scale uniformly: the astro/TPC-H tables (lineitem, orders,
  * events, …) grow 10× at every step (6k → 60k → 600k lineitems), but
  * documents/embeddings are flat from sf0.001 to sf0.01 (500 docs at
  * both) and only grow 10× into sf0.1. So:
  *  - astro-rooted queries fit the least-squares slope over two
  *    decades: e = log10(t_sf0.1 / t_sf0.001) / 2;
  *  - corpus-rooted queries fit the single real decade:
  *    e = log10(t_sf0.1 / t_sf0.01), and the flat sf0.001 → sf0.01
  *    step doubles as a per-query NOISE FLOOR (same data, solo JVMs —
  *    its ratio is pure container jitter; treat exponents within the
  *    floor's spread as noise, not signal).
  *
  * Container timing jitter is real (±50%); judge a query by the
  * ORDER of its exponent, not the digits, and re-run before
  * concluding a regression. Results land in the round notes.
  */
object SfScaling {

  private val defaultQueries = Seq(
    "st4_pubsub_alerts", "cc5_live_clusters", "g1_pagerank",
    "st3_stream_neardup", "r7_prf_expand", "g2_triangles",
    "d6_semantic_dedup", "ev8_incremental_rollup", "e3_export_manifest",
    "g5_bfs", "t23_kn_buckets", "d5_embed_neardup", "st2_stream_sessions",
    "g4_communities", "g3_link_predict", "r5_mmr_rerank",
    "e8_training_export", "t21_trigram_kn", "a19_lomb_scargle",
    "t10_dsir_weights")

  /** Battery prefixes whose inputs are the astro/TPC-H tables, which
    * scale 10× at EVERY sf step. Everything else reads
    * documents/embeddings, flat from sf0.001 to sf0.01. */
  private val astroPrefixes = Seq("a1", "a2", "a4", "a5", "a7", "a8", "a9",
    "j", "w", "q1", "f", "o", "x", "hg", "sp", "b1", "st1", "st2", "st4",
    "ev", "s1_snana", "s2_dp1", "s9", "set", "p1_filters", "t6", "a10",
    "a11", "a12", "a13", "a14", "a15", "a16", "a17", "a18", "a19", "a20",
    "a21", "a22", "a23")

  private def isAstro(name: String): Boolean =
    astroPrefixes.exists(name.startsWith)

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(defaultQueries)
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val log = new File("sfscaling_children.log")

    def run(name: String, dir: String): Option[Double] = {
      val out = Files.createTempFile("sfscale", ".csv").toFile
      Bench.forkChild(Seq("--child", out.getAbsolutePath, name), log,
        timeoutMin = 20, env = Map("SPARK_GRAFT_SF_DIR" -> dir))
      val res =
        if (!out.exists()) None
        else scala.io.Source.fromFile(out).getLines().toSeq.headOption.flatMap {
          // a child killed at the fork timeout can leave a truncated or
          // garbage line — that query reports FAILED, it must not crash
          // the whole sweep (toDouble in a pattern GUARD would throw)
          _.split(",") match {
            case Array(_, c, _, b) =>
              scala.util.Try((c.toDouble, b.toDouble)).toOption
                .filter(_._1 >= 0).map(_._2)
            case _ => None
          }
        }
      out.delete()
      res
    }

    println("| query | family | sf0.001 | sf0.01 | sf0.1 | r1 | r2 " +
      "| exponent | note |")
    println("|---|---|---|---|---|---|---|---|---|")
    names.foreach { n =>
      val t = sfs.map(run(n, _))
      (t.head, t(1), t(2)) match {
        case (Some(t1), Some(t2), Some(t3)) =>
          val astro = isAstro(n)
          val r1 = t2 / math.max(t1, 1e-9)
          val r2 = t3 / math.max(t2, 1e-9)
          val e =
            if (astro) math.log10(t3 / math.max(t1, 1e-9)) / 2
            else math.log10(r2)
          val note =
            if (e > 1.2) "FINDING: superlinear"
            else if (!astro && r1 > 1.5) "noisy floor — re-run"
            else ""
          println(f"| $n | ${if (astro) "astro" else "corpus"} " +
            f"| $t1%.2f | $t2%.2f | $t3%.2f | $r1%.2f | $r2%.2f " +
            f"| $e%.2f | $note |")
        case _ =>
          println(s"| $n | ${if (isAstro(n)) "astro" else "corpus"} " +
            "| FAILED | FAILED | FAILED | - | - | - | |")
      }
    }
  }
}
