package graft.genomics

import graft.SparkSpec
import graft.sources.Vcf
import org.apache.spark.sql.functions._

/** Trio phasing against the reference's golden VCF pair
  * (trio.1_837214.vcf -> trio.1_837214.phased.vcf): at chr1:837214 G->C,
  * father NA12891 is hom-ref, mother NA12892 het, child NA12878 het —
  * the child's ALT can only be maternal, so the call phases.
  */
class TrioGoldenSpec extends SparkSpec {

  private val res = "/root/reference/avocado-core/src/test/resources"

  test("1/837214: child het phases to the maternal ALT") {
    val gts = Vcf.read(spark, s"$res/trio.1_837214.vcf")
      .withColumn("end", col("start") + 1)
    // sanity on the parsed states (GT fields are 0/0, 1/0, 1/0)
    val states = gts.select("sampleId", "genotypeState").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(states === Map("NA12891" -> 0, "NA12892" -> 1, "NA12878" -> 1))

    val out = TrioCaller(gts, motherId = "NA12892", fatherId = "NA12891",
      childId = "NA12878").collect()
    assert(out.length === 1)
    val site = out.head
    assert(!site.getAs[Boolean]("mendelError"))
    assert(site.getAs[Boolean]("phased"))
    // maternal|paternal order: ALT from the het mother, REF from the
    // hom-ref father (the reference's phased VCF encodes the same
    // assignment as 0|1 in its own column order)
    assert(site.getSeq[String](site.fieldIndex("childAlleles")).toList === List("ALT", "REF"))
  }
}
