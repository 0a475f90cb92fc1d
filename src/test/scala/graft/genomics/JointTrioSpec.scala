package graft.genomics

import graft.SparkSpec
import graft.kernels.LogMath
import org.apache.spark.sql.functions._

class JointTrioSpec extends SparkSpec {

  // (contig, start, end, ref, alt, sample, state, quality, depth, gl0, gl1, gl2)
  private def gt(start: Long, alt: String, sample: String, state: Int,
      gl: (Double, Double, Double), end: Long = -1, ref: String = "A", depth: Int = 30) =
    ("chr1", start, if (end < 0) start + 1 else end, ref,
      Option(alt), sample, state, 50.0, depth, gl._1, gl._2, gl._3)

  private val cols = Seq("contigName", "start", "end", "referenceAllele",
    "alternateAllele", "sampleId", "genotypeState", "genotypeQuality",
    "readDepth", "gl_0", "gl_1", "gl_2")

  test("trimRight canonicalizes alleles, keeping one base") {
    assert(SquareOff.trimRight("ACC", "TCC") === 2)
    assert(SquareOff.trimRight("A", "T") === 0)
    assert(SquareOff.trimRight("AAAA", "AA") === 1) // bounded by shorter-1
    assert(SquareOff.trimRight("ACGT", "TT") === 1)
  }

  test("extractVariants trims, dedups, and drops ref blocks") {
    import spark.implicits._
    val gts = Seq(
      gt(100, "CCC", "s1", 1, (-10.0, -1.0, -5.0), ref = "ACC"), // trims to A->C
      gt(100, "CCC", "s2", 2, (-10.0, -1.0, -5.0), ref = "ACC"), // same after trim
      gt(200, null, "s1", 0, (-0.1, -5.0, -20.0), end = 300)     // ref block
    ).toDF(cols: _*)
    val v = SquareOff.extractVariants(gts).collect()
    assert(v.length === 1)
    assert(v.head.getAs[String]("referenceAllele") === "A")
    assert(v.head.getAs[String]("alternateAllele") === "C")
    assert(v.head.getAs[Long]("end") === 101)
  }

  test("squareOff picks exact calls and fills ref-model rows") {
    import spark.implicits._
    val gts = Seq(
      gt(150, "C", "s1", 1, (-8.0, -0.5, -9.0)),               // s1 has the variant
      gt(100, null, "s2", 0, (-0.1, -6.0, -30.0), end = 400)   // s2: ref block spans site
    ).toDF(cols: _*)
    val sq = SquareOff.squareOff(gts).collect()
      .map(r => r.getAs[String]("sampleId") -> r).toMap
    assert(sq.keySet === Set("s1", "s2"))
    assert(sq("s1").getAs[Int]("genotypeState") === 1)
    assert(sq("s1").getAs[Boolean]("exactCall"))
    assert(sq("s2").getAs[Int]("genotypeState") === 0)
    assert(!sq("s2").getAs[Boolean]("exactCall"))
    // the ref block's likelihoods ride along as the non-ref model
    assert(sq("s2").getAs[Double]("gl_0") === -0.1)
  }

  test("joint caller: MAF, monomorphic drop, binomial-prior recall") {
    import spark.implicits._
    // site A: 3 samples, states 1,1,2 -> maf = 4/6; site B monomorphic
    val squared = Seq(
      gt(10, "C", "s1", 1, (-8.0, -0.5, -9.0)),
      gt(10, "C", "s2", 1, (-7.0, -0.4, -8.0)),
      gt(10, "C", "s3", 2, (-20.0, -5.0, -0.2)),
      gt(99, "G", "s1", 0, (-0.1, -9.0, -30.0)),
      gt(99, "G", "s2", 0, (-0.1, -9.0, -30.0))
    ).toDF(cols: _*)
    val out = JointAnnotatorCaller(squared)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Long]("start") === 10L)) // monomorphic site dropped
    assert(rows.length === 3)
    val maf = rows.head.getAs[Double]("maf")
    assert(math.abs(maf - 4.0 / 6.0) < 1e-12)

    // recall of s1 by hand: posterior_g = logC(2,g) + g ln maf + (2-g) ln(1-maf) + gl_g
    val gl = Seq(-8.0, -0.5, -9.0)
    val post = (0 to 2).map(g =>
      LogMath.logChoose(2, g) + g * math.log(maf) + (2 - g) * math.log1p(-maf) + gl(g))
    val s1 = rows.find(_.getAs[String]("sampleId") == "s1").get
    assert(s1.getAs[Int]("recalledState") === post.indexOf(post.max))
    val sortedP = post.sorted.reverse
    assert(math.abs(s1.getAs[Double]("recalledQuality") -
      math.rint(10.0 / math.log(10.0) * (sortedP(0) - sortedP(1)) * 1000) / 1000) < 1e-9)
    assert(s1.getAs[Long]("siteDepth") === 90)
  }

  test("joint caller: MAF = 1.0 recalls with no prior (reference boundary)") {
    import spark.implicits._
    // every sample hom-alt -> maf = 1.0; the binomial prior is undefined
    // there (log(1-maf) = -inf, and 0 * -inf = NaN would poison the
    // argmax). Reference JointAnnotatorCaller.scala:162-166 recalls with
    // an EMPTY prior at the boundary: posterior = likelihoods alone.
    // This is the everyday single-sample pipeline case (CLI jointer on
    // one sample's calls: every emitted alt site has maf 1.0 or 0.5).
    val squared = Seq(
      gt(10, "C", "s1", 2, (-20.0, -5.0, -0.2)),
      gt(10, "C", "s2", 2, (-18.0, -4.0, -0.3))
    ).toDF(cols: _*)
    val rows = JointAnnotatorCaller(squared).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Double]("maf") === 1.0))
    assert(rows.forall(_.getAs[Int]("recalledState") === 2),
      "GL argmax must survive the degenerate prior")
    val s1 = rows.find(_.getAs[String]("sampleId") == "s1").get
    // quality = best - second of the bare GLs
    assert(math.abs(s1.getAs[Double]("recalledQuality") -
      math.rint(10.0 / math.log(10.0) * (-0.2 - -5.0) * 1000) / 1000) < 1e-9)
  }

  test("trio caller phases hets and flags Mendelian violations") {
    import spark.implicits._
    val gts = Seq(
      // site 1: mother het, father hom-ref, child het -> maternal ALT phase
      gt(10, "C", "mom", 1, (-5.0, -0.5, -9.0)),
      gt(10, "C", "dad", 0, (-0.1, -6.0, -30.0)),
      gt(10, "C", "kid", 1, (-5.0, -0.5, -9.0)),
      // site 2: both parents hom-ref, child hom-alt -> violation
      gt(20, "G", "mom", 0, (-0.1, -6.0, -30.0)),
      gt(20, "G", "dad", 0, (-0.1, -6.0, -30.0)),
      gt(20, "G", "kid", 2, (-20.0, -5.0, -0.2)),
      // site 3: both parents het, child het -> unphasable
      gt(30, "T", "mom", 1, (-5.0, -0.5, -9.0)),
      gt(30, "T", "dad", 1, (-5.0, -0.5, -9.0)),
      gt(30, "T", "kid", 1, (-5.0, -0.5, -9.0))
    ).toDF(cols: _*)
    val out = TrioCaller(gts, "mom", "dad", "kid").collect()
      .map(r => r.getAs[Long]("start") -> r).toMap

    val site1 = out(10L)
    assert(!site1.getAs[Boolean]("mendelError"))
    assert(site1.getAs[Boolean]("phased"))
    assert(site1.getSeq[String](site1.fieldIndex("childAlleles")).toList === List("ALT", "REF"))

    val site2 = out(20L)
    assert(site2.getAs[Boolean]("mendelError"))
    assert(site2.getSeq[String](site2.fieldIndex("childAlleles")).toList === List("NO_CALL", "NO_CALL"))

    val site3 = out(30L)
    assert(!site3.getAs[Boolean]("mendelError"))
    assert(!site3.getAs[Boolean]("phased"))
  }
}
