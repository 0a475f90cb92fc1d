package graft.cli

import graft.SparkSpec

/** End-to-end CLI golden runs: the reference's two-step calling pipeline —
  * `biallelicGenotyper` SAM-in → filtered-call parquet
  * (reference `avocado-cli/.../BiallelicGenotyper.scala:284-285` saves
  * parquet), then `jointer` → VCF (reference `Jointer.scala:74-86`) —
  * driven purely through `cli.Main`, with the COMPLETE VCF output diffed
  * against checked-in golden files. Any drift in any emission field
  * (POS/REF/ALT, QUAL, FILTER, INFO, GT/AD/DP/GQ/PL cells, header lines)
  * fails the diff.
  *
  * The golden files are not self-referential ground truth: each carries a
  * load-bearing call that GoldenSitesSpec asserts independently from the
  * reference's own BiallelicGenotyperSuite — re-asserted here directly
  * against the VCF text so a golden file cannot silently go stale on the
  * site that anchors it. 886049 additionally freezes a multi-site
  * emission (SNV + deletions + an insertion in one file).
  */
class CliGoldenSpec extends SparkSpec {

  private val res = "/root/reference/avocado-core/src/test/resources"

  private def cliVcf(fixture: String): Seq[String] = {
    val tmp = java.nio.file.Files.createTempDirectory("cli-golden").toString
    spark // warm the session so Main reuses it
    Main.main(Array("biallelicGenotyper", s"$res/$fixture.sam", s"$tmp/calls"))
    Main.main(Array("jointer", s"$tmp/calls", s"$tmp/vcf"))
    spark.read.textFile(s"$tmp/vcf").collect().toSeq
  }

  private def assertMatchesGolden(fixture: String, anchor: String => Boolean,
      anchorDesc: String): Unit = {
    val produced = cliVcf(fixture)
    val golden = {
      val src = scala.io.Source.fromFile(
        s"src/test/resources/golden/$fixture.cli.vcf")
      try src.getLines().toList finally src.close()
    }
    // header: content-exact (sorted — part-file read order is not a
    // contract); data: every line byte-exact, order-agnostic on ties
    val (ph, pd) = produced.partition(_.startsWith("#"))
    val (gh, gd) = golden.partition(_.startsWith("#"))
    assert(ph.sorted === gh.sorted, s"$fixture: VCF header drifted")
    assert(pd.sorted === gd.sorted, s"$fixture: VCF data lines drifted")
    assert(pd.exists(anchor), s"$fixture: reference-truth anchor missing ($anchorDesc)")
  }

  test("CLI SAM->genotyper->jointer VCF matches golden: 1/875159 deletion") {
    assertMatchesGolden("NA12878.chr1.875159",
      l => l.startsWith("1\t875159\t") &&
        l.contains("AGCCAGTGGACGCCGACCT\tA") && l.contains("1/1"),
      "hom-alt 19bp deletion at 1:875159")
  }

  test("CLI SAM->genotyper->jointer VCF matches golden: 1/886049 multi-site") {
    assertMatchesGolden("NA12878.chr1.886049",
      l => l.startsWith("1\t886049\t") &&
        l.contains("ACAG\tA") && l.contains("1/1"),
      "hom-alt ACAG->A deletion at 1:886049")
  }
}
