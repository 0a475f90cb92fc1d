package graft.kernels

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class AlignerSpec extends AnyFunSuite {

  private def checkInvariants(ref: String, alt: String, ops: Seq[AlnOp]): Unit = {
    assert(AlignmentOps.readLength(ops) === alt.length, s"read len: $ops")
    assert(AlignmentOps.referenceLength(ops) === ref.length, s"ref len: $ops")
    assert(AlignmentOps.extractReference(alt, ops) === ref, s"ref reconstruction: $ops")
  }

  test("identical sequences align as one match run") {
    val s = "ACGTACGTACGTACGTACGT"
    assert(Aligner.align(s, s) === Seq(AlnMatch(20)))
  }

  test("single SNV becomes a 1-base mismatch") {
    val ref = "ACGTACGTACGTACGTACGT"
    val alt = ref.updated(10, 'T' /* was G */)
    val ops = Aligner.align(ref, alt, k = 4)
    checkInvariants(ref, alt, ops)
    assert(ops === Seq(AlnMatch(10), AlnMatch(1, Some("G")), AlnMatch(9)))
  }

  test("clean insertion and deletion") {
    val ref = "ACGGTTCAACGGTTCAAGGC"
    val ins = ref.substring(0, 10) + "TTT" + ref.substring(10)
    val opsI = Aligner.align(ref, ins, k = 4)
    checkInvariants(ref, ins, opsI)
    assert(opsI.count(_.isInstanceOf[AlnIns]) === 1)
    assert(opsI.collect { case AlnIns(n) => n }.sum === 3)

    val del = ref.substring(0, 8) + ref.substring(12)
    val opsD = Aligner.align(ref, del, k = 4)
    checkInvariants(ref, del, opsD)
    assert(opsD.collect { case AlnDel(b) => b }.mkString === ref.substring(8, 12))
  }

  test("complex change (snv + indel) keeps invariants") {
    val ref = "ACGGTTCAACGGTTCAAGGCCATTGACCA"
    val alt = "ACGGTTCTACGGTCAAGGCCATTGACCA" // SNV at 7, deletion of one T
    val ops = Aligner.align(ref, alt, k = 4)
    checkInvariants(ref, alt, ops)
  }

  test("unanchorable pair squashes but keeps invariants") {
    val ref = "AAAAAAAAAA" // repetitive: no unique k-mers
    val alt = "AAAAATAAAAA"
    val ops = Aligner.align(ref, alt, k = 4)
    checkInvariants(ref, alt, ops)
  }

  test("property: invariants hold over random mutations") {
    val rnd = new Random(13)
    val bases = "ACGT"
    (0 until 300).foreach { i =>
      val ref = (0 until 30 + rnd.nextInt(60)).map(_ => bases(rnd.nextInt(4))).mkString
      val alt = {
        val sb = new StringBuilder(ref)
        (0 until 1 + rnd.nextInt(3)).foreach { _ =>
          val pos = rnd.nextInt(math.max(1, sb.length - 1))
          rnd.nextInt(3) match {
            case 0 => sb.setCharAt(pos, bases(rnd.nextInt(4)))            // SNV
            case 1 => sb.insert(pos, bases(rnd.nextInt(4)).toString * (1 + rnd.nextInt(3))) // ins
            case 2 => if (sb.length > 5) sb.delete(pos, math.min(sb.length, pos + 1 + rnd.nextInt(3))) // del
          }
        }
        sb.toString
      }
      val ops = Aligner.align(ref, alt, k = 6)
      checkInvariants(ref, alt, ops)
    }
  }
}
