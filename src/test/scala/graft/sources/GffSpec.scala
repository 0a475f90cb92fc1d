package graft.sources

import graft.SparkSpec

class GffSpec extends SparkSpec {

  private val fixture =
    """##gff-version 3
      |# CNV calls from a hypothetical caller
      |chr1	cnvkit	DUP	101	300	42.0	+	.	ID=cnv1;SVTYPE=DUP
      |chr1	cnvkit	DEL	1001	1200	.	-	.	ID=cnv2
      |chr2	cnvkit	DUP	51	150	7.5	?	.	ID=cnv3
      |malformed line without tabs
      |chrX	cnvkit	DUP	10	20	.	.	.
      |""".stripMargin

  private lazy val path = {
    val p = java.nio.file.Files.createTempFile("cnv", ".gff")
    java.nio.file.Files.writeString(p, fixture)
    p.toString
  }

  test("parses data rows, converts 1-based inclusive to 0-based half-open") {
    val feats = Gff.read(spark, path).collect().sortBy(f => (f.contigName, f.start))
    assert(feats.length === 4, "comments, pragmas and malformed rows skipped")
    val dup = feats.head
    assert(dup.contigName === "chr1" && dup.start === 100L && dup.end === 300L)
    assert(dup.featureType === "DUP" && dup.source === "cnvkit")
    assert(dup.score === Some(42.0) && dup.strand === Some("+"))
    assert(dup.attributes.contains("SVTYPE=DUP"))
    val del = feats(1)
    assert(del.featureType === "DEL" && del.score === None && del.strand === Some("-"))
  }

  test("feeds CopyNumberMap: DUP/DEL adjust ploidy inside their span") {
    val m = graft.genomics.CopyNumberMap.fromFeatures(Gff.read(spark, path).toDF)
    assert(m.at("chr1", 150L) === 3, "inside DUP")
    assert(m.at("chr1", 1100L) === 1, "inside DEL")
    assert(m.at("chr1", 500L) === 2, "between features: base")
    assert(m.at("chr3", 10L) === 2, "unfeatured contig: base")
  }

  test("composes with whole-contig overrides: intervals win inside their span") {
    val m = graft.genomics.CopyNumberMap.fromFeatures(
      Gff.read(spark, path).toDF, basePloidy = 2, contigBases = Map("chrX" -> 1, "chrY" -> 1))
    assert(m.at("chrX", 15L) === 2, "DUP relative to the haploid contig base")
    assert(m.at("chrX", 100L) === 1, "rest of chrX stays haploid")
    assert(m.at("chrY", 5L) === 1, "override-only contig")
    assert(m.at("chr1", 150L) === 3, "plain contig features unaffected")
    assert(m.minPloidy === 1 && m.maxPloidy === 3)
  }
}
