package graft

import java.io.File
import java.nio.file.Files

/** Per-query scale-factor scaling smoke: `runMain graft.SfScaling
  * [query,query,...]` runs each query at sf0.01 AND sf0.1 (10× data)
  * in solo child JVMs (the [[Bench]] fork/isolation machinery, so
  * chunk co-tenancy can't distort the ratio) and tables the
  * best-of-runs time ratio per query.
  *
  * What it catches that the single sf0.1 bench point can't: a query
  * whose cost is secretly CONSTANT (driver-side, cached, or
  * fixed-overhead dominated — ratio ≈ 1 is fine for streaming/commit
  * shapes but suspicious for scans) and, the dangerous direction, one
  * that is SUPERLINEAR (ratio ≫ 10: a join building up quadratic work
  * or a shuffle losing its bound as data grows). Container timing
  * jitter is real (±50%); judge a query by the ORDER of its ratio,
  * not the digits, and re-run before concluding a regression.
  *
  * Defaults to the 20 most expensive battery queries by BENCH best
  * time. Results land in the round notes.
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

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(defaultQueries)
    val sfs = Seq("0.01" -> "/root/testdata/sf0.01", "0.1" -> "/root/testdata/sf0.1")
    val log = new File("sfscaling_children.log")

    def run(name: String, dir: String): Option[(Double, Double)] = {
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
                .filter(_._1 >= 0)
            case _ => None
          }
        }
      out.delete()
      res
    }

    println("| query | sf0.01 best | sf0.1 best | t-ratio (10x data) |")
    println("|---|---|---|---|")
    names.foreach { n =>
      val r = sfs.map { case (_, dir) => run(n, dir) }
      (r.head, r(1)) match {
        case (Some((_, b1)), Some((_, b10))) =>
          println(f"| $n | ${b1}%.2f | ${b10}%.2f | ${b10 / math.max(b1, 1e-9)}%.2f |")
        case _ =>
          println(s"| $n | FAILED | FAILED | - |")
      }
    }
  }
}
