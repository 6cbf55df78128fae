package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Cross-engine numeric-portability helpers shared by the battery.
  *
  * The sign-of-zero rule (the a19 atan2 branch-cut lesson generalized
  * — see notes/round11.md — and the t15 PMI hash-FAIL root cause): a
  * value that is mathematically zero up to accumulation noise can
  * round to +0.0 on one engine and -0.0 on the other. pandas treats
  * them equal; the driver's value hash sees the sign bit. Every
  * rounded battery output that can sit at a TINY NEGATIVE value —
  * PMI, z-scores, slopes, log-ratios, cosine similarities,
  * divergences, lift/attribution shares — must canonicalize the sign
  * of zero AFTER rounding: IEEE 754 guarantees `-0.0 + 0.0 == +0.0`
  * and leaves every non-zero value bit-identical. The paired oracle
  * SQL must spell the identical `ROUND(x, n) + 0.0`.
  */
object Num {

  /** `round(c, scale)` with the sign of zero canonicalized. Use for
    * any rounded output column whose value can be a tiny negative;
    * keep the oracle side textually in lockstep (`ROUND(e, n) + 0.0`).
    */
  def rnd0(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)
}
