package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SceneCutsSpec extends SparkSpec {
  import spark.implicits._

  private def run(ids: Seq[Long]) = {
    val mk = udf((id: Long) => Multimodal.synthMp4(id))
    Multimodal.videoSceneCuts(
      ids.toDF("doc_id").withColumn("payload", mk(col("doc_id"))))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5, r._6))
  }

  /** Independent closed-form replay of the fixture writer's math. */
  private def expected(id: Long): Seq[(Long, Long, Long, Long, Long)] = {
    val n = 3 + (id % 5).toInt
    val fs = (0 until n).map { i =>
      val s = 16 + ((id * 7 + i * 3) % 17).toInt
      val ii = (0 until s).map(p => 97L + (id * 31 + i * 7 + p) % 26).sum
      (s.toLong, ii)
    }
    val cuts = 0L +: (1 until n).map { i =>
      val (s1, i1) = fs(i - 1); val (s2, i2) = fs(i)
      if (math.abs(i2 * s1 - i1 * s2) * 2 > 3 * s1 * s2) 1L else 0L
    }
    val segIdx = cuts.scanLeft(0L)(_ + _).tail
    (0 until n).groupBy(segIdx(_)).toSeq.map { case (seg, frames) =>
      (seg, frames.min.toLong, frames.max.toLong, frames.size.toLong,
        frames.map(fs(_)._1).sum)
    }
  }

  test("segments match the closed-form fixture truth, byte reads included") {
    val ids = (0L until 200L)
    val got = run(ids).groupBy(_._1)
    ids.foreach { id =>
      val want = expected(id).map(t => (id, t._1, t._2, t._3, t._4, t._5)).toSet
      assert(got(id).toSet == want, s"doc $id")
    }
  }

  test("segments partition the frame sequence: counts sum to n, bounds chain") {
    run(0L until 300L).groupBy(_._1).foreach { case (id, segs) =>
      val n = 3 + (id % 5)
      assert(segs.map(_._5).sum == n, s"doc $id frame count")
      val ordered = segs.sortBy(_._2)
      assert(ordered.head._3 == 0, s"doc $id first segment starts at frame 0")
      assert(ordered.last._4 == n - 1, s"doc $id last segment ends at n-1")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 == a._4 + 1, s"doc $id segments must chain")
        case _ =>
      }
    }
  }

  test("threshold is live: the fixture yields both cut and uncut boundaries") {
    val segs = run(0L until 500L)
    val perDoc = segs.groupBy(_._1).view.mapValues(_.size)
    assert(perDoc.values.exists(_ > 1), "some doc must have a cut")
    assert(perDoc.exists { case (id, n) => n < 3 + (id % 5) },
      "some consecutive frames must stay in one segment")
  }

  test("non-MP4 payloads produce no rows rather than guessed segments") {
    val junk = Seq((1L, "not an mp4".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    assert(Multimodal.videoSceneCuts(junk).count() == 0)
  }

  test("clearFrameTableCache removes the on-disk layouts it orphans") {
    val mk = udf((id: Long) => Multimodal.synthMp4(id))
    val df = (0L until 20L).toDF("doc_id").withColumn("payload", mk(col("doc_id")))
    val nCached = Multimodal.sharedFrameTable(df, cacheKey = "lifecycle-spec").count()
    assert(nCached > 0)
    val root = new java.io.File(
      s"/tmp/graft_frames_${ProcessHandle.current().pid()}")
    assert(root.exists(), "materialized layout must exist while cached")
    Multimodal.clearFrameTableCache()
    assert(!root.exists(), "clearFrameTableCache must delete the scratch root")
    // a later caller must be able to rebuild after the clear
    val rebuilt = Multimodal.sharedFrameTable(df, cacheKey = "lifecycle-spec")
    assert(rebuilt.count() == nCached)
    Multimodal.clearFrameTableCache()
  }
}
