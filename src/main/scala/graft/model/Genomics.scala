package graft.model

/** Genomic data model, re-expressed as Spark-SQL-friendly case classes.
  *
  * Shapes follow the reference's Avro records (see SURVEY.md §1;
  * reference: avocado-core/.../genotyping/DiscoveredVariant.scala:72-109,
  * bdg-formats AlignmentRecord) but are defined fresh for Dataset
  * encoders: `Option[_]` ⇒ nullable column, arrays ⇒ ArrayType.
  */

/** A sequenced read (alignment record). Quality is phred+33 chars. */
case class Read(
    readName: String,
    contigName: String,
    start: Long,
    end: Long,
    sequence: String,
    qual: String,
    cigar: String,
    mdTag: String,
    mapq: Int,
    readMapped: Boolean,
    readNegativeStrand: Boolean,
    duplicateRead: Boolean,
    primaryAlignment: Boolean,
    sampleId: String,
    mateContigName: Option[String] = None,
    mateStart: Option[Long] = None,
    mateMapped: Boolean = false)

/** A discovered (candidate) variant; alt=None encodes the symbolic
  * non-ref allele of the gVCF model
  * (reference DiscoveredVariant.scala:81). Half-open [start, end).
  */
case class DiscoveredVariant(
    contigName: String,
    start: Long,
    referenceAllele: String,
    alternateAllele: Option[String]) {
  def end: Long = start + math.max(referenceAllele.length, 1)
  def overlaps(c: String, s: Long, e: Long): Boolean =
    c == contigName && s < end && e > start
}

case class Variant(
    contigName: String,
    start: Long,
    end: Long,
    referenceAllele: String,
    alternateAllele: Option[String])

/** Per-(variant,sample) aggregated observation: the output row of the
  * wide hash aggregation (SURVEY.md A3). Log-likelihood arrays are
  * length maxCopyNumber+1.
  */
case class Observation(
    alleleForwardStrand: Int,
    otherForwardStrand: Int,
    squareMapQ: Double,
    alleleLogLikelihoods: Array[Double],
    otherLogLikelihoods: Array[Double],
    nonRefLogLikelihoods: Array[Double],
    totalLogLikelihoods: Array[Double],
    alleleCoverage: Int,
    otherCoverage: Int,
    totalCoverage: Int,
    isRef: Boolean,
    copyNumber: Int)

/** A called genotype at one site for one sample. Alleles are
  * "REF"/"ALT"/"OTHER_ALT"/"NO_CALL" strings (enum-as-string, as the
  * reference compares them in SQL; SquareOffReferenceModel.scala:137-143).
  */
case class CalledGenotype(
    contigName: String,
    start: Long,
    end: Long,
    referenceAllele: String,
    alternateAllele: Option[String],
    sampleId: String,
    alleles: Seq[String],
    genotypeLikelihoods: Seq[Double],
    nonReferenceLikelihoods: Seq[Double],
    genotypeQuality: Int,
    readDepth: Int,
    referenceReadDepth: Int,
    alternateReadDepth: Int,
    strandBiasForward: Int,
    strandBiasReverse: Int,
    rmsMapQ: Double,
    phased: Boolean = false,
    filtersPassed: Boolean = true,
    filtersFailed: Seq[String] = Nil)

/** A genomic feature (reference Feature usage, CopyNumberMap.scala:46-54:
  * CNV calls typed DUP/DEL). Half-open [start, end).
  */
case class Feature(
    contigName: String,
    start: Long,
    end: Long,
    featureType: String,
    source: String,
    score: Option[Double] = None,
    strand: Option[String] = None,
    attributes: String = "")
