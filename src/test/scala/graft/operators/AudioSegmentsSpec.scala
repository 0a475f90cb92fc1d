package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def segs(ids: Seq[Long]) =
    Multimodal.audioSegments(
      Multimodal.attachSynthWav(ids.toDF("doc_id"), "doc_id"), "doc_id")

  test("segments match a direct replay of the closed-form energies") {
    val ids = (0L until 40L)
    val got = segs(ids).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // replay: per-id full 16-sample windows, energy sums, mean threshold,
    // islands — straight-line Scala, independent of the Spark plan
    val want = ids.flatMap { id =>
      val n = 64 + java.lang.Math.floorMod(id, 33L).toInt
      val nW = n / 16
      val en = (0 until nW).map { w =>
        (0 until 16).map { j =>
          val t = w * 16 + j
          val s = java.lang.Math.floorMod(id * 31 + t * 7, 65536L) - 32768L
          s * s
        }.sum
      }
      val tot = en.sum
      val active = (0 until nW).filter(w => en(w) * nW > tot)
      // islands of consecutive active windows
      val out = scala.collection.mutable.ListBuffer[(Long, Long, Long, Long, Long)]()
      var i = 0
      while (i < active.length) {
        var j = i
        while (j + 1 < active.length && active(j + 1) == active(j) + 1) j += 1
        val ws = active.slice(i, j + 1)
        out += ((id, ws.head.toLong, ws.last.toLong, ws.length.toLong,
          ws.map(en(_)).sum))
        i = j + 1
      }
      out
    }.toSet
    assert(got === want)
  }

  test("segment invariants: ordered, in range, above the file mean") {
    val rows = segs(0L until 100L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (start, end, nw) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(start >= 0 && end >= start && end - start + 1 === nw)
      assert(end < 6, "at most 96 samples = 6 full windows")
      assert(r.getLong(4) > 0L, "active segments carry positive energy")
    }
  }

  test("bad payloads are counted, not propagated") {
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
      .unionByName(Multimodal.attachSynthWav(Seq(3L).toDF("doc_id"), "doc_id"))
    val out = Multimodal.audioSegments(df, "doc_id").collect()
    assert(out.forall(_.getLong(0) == 3L))
    assert(Multimodal.lastBadPayloads.get.value === 2L)
  }
}
