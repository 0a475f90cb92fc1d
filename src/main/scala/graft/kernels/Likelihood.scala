package graft.kernels

/** The biallelic genotype likelihood model (Li 2011 / samtools mpileup
  * family, as used by the reference's Observer kernel —
  * avocado-core/.../genotyping/Observer.scala:151-185): for a site with
  * copy number m and a read with combined success probability
  * p = P(mapped correctly)·P(base called correctly), ε = 1 − p, the
  * likelihood of the read under genotype state g (g alt copies of m) is
  *
  *   P(read shows ALT | g) = (g·(1−ε) + (m−g)·ε) / m
  *   P(read shows REF | g) = (g·ε + (m−g)·(1−ε)) / m
  *
  * Log-space, per state, precomputable over the small discrete domain
  * (quality × mapQ × m) — which is exactly why the genotyper joins a
  * generated score table instead of evaluating this per row.
  */
object Likelihood {

  /** Sentinel for "no base quality": deletion observations carry no
    * per-base quality (the deleted bases aren't in the read), so their
    * error model is mapping-quality-only — the reference's
    * optQuality = None (Observer.scala:120-137, ScoredObservation
    * .scala:163-165: baseSuccessProb defaults to 1.0).
    */
  final val NoQual = -1

  /** ε = 1 − P(map ok)·P(base ok); baseQ < 0 means no base quality
    * (P(base ok) = 1).
    */
  def epsilon(baseQ: Int, mapQ: Int): Double = {
    val baseOk = if (baseQ < 0) 1.0 else LogMath.phredToSuccessProbability(baseQ)
    1.0 - baseOk * LogMath.phredToSuccessProbability(mapQ)
  }

  /** Log-likelihoods of a read *supporting the allele*, indexed by
    * g = 0..m alt copies.
    */
  def alleleLogLikelihoods(baseQ: Int, mapQ: Int, m: Int): Array[Double] = {
    val e = epsilon(baseQ, mapQ)
    Array.tabulate(m + 1) { g =>
      math.log(g * (1.0 - e) + (m - g) * e) - math.log(m.toDouble)
    }
  }

  /** Log-likelihoods of a read *supporting the reference* (or any other
    * allele), indexed by g = 0..m alt copies of the scored allele.
    */
  def otherLogLikelihoods(baseQ: Int, mapQ: Int, m: Int): Array[Double] = {
    val e = epsilon(baseQ, mapQ)
    Array.tabulate(m + 1) { g =>
      math.log(g * e + (m - g) * (1.0 - e)) - math.log(m.toDouble)
    }
  }
}
