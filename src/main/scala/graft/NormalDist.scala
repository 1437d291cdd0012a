package graft

/** The ONE copy of the Abramowitz–Stegun 7.1.26 erfc tail polynomial —
  * every z-test / normal-CDF site (bh_fdr, mcnemar_gates, mixture_gof)
  * renders its SQL through this builder so the five constants cannot
  * drift between engines or between queries. The fragment is
  * engine-portable (Spark SQL and DuckDB parse and evaluate it
  * identically) and is combined with one `exp(−z²/2)` libm call at the
  * call site (the repo's one-quantized-libm-call discipline).
  */
private[graft] object NormalDist {

  /** poly(t) with t = 1/(1 + 0.3275911·(z/√2)) — the five-term A&S
    * 7.1.26 polynomial over the given z expression string. The caller
    * is responsible for passing a NON-NEGATIVE z expression (wrap in
    * `abs(...)` when the sign is data-dependent) and for multiplying
    * by its own `exp(−z²/2)` factor.
    */
  def erfcTailPoly(z: String): String =
    s"""(0.254829592 / (1 + 0.3275911 * (($z) / sqrt(2.0)))
       |  - 0.284496736 / pow(1 + 0.3275911 * (($z) / sqrt(2.0)), 2)
       |  + 1.421413741 / pow(1 + 0.3275911 * (($z) / sqrt(2.0)), 3)
       |  - 1.453152027 / pow(1 + 0.3275911 * (($z) / sqrt(2.0)), 4)
       |  + 1.061405429 / pow(1 + 0.3275911 * (($z) / sqrt(2.0)), 5))""".stripMargin
}
