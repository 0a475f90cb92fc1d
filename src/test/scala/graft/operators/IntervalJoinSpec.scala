package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {

  /** Nested-loop oracle vs the bin-bucketed rewrite on random intervals,
    * across bin sizes smaller/equal/larger than interval widths, so
    * bin-boundary duplicate handling is exercised.
    */
  test("overlap join matches nested-loop oracle on random intervals") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 300).map { i =>
      val s = rnd.nextDouble() * 1000 - 100
      (i.toLong, s, s + rnd.nextDouble() * 80)
    }
    val right = (0 until 300).map { i =>
      val s = rnd.nextDouble() * 1000 - 100
      (i.toLong, s, s + rnd.nextDouble() * 80)
    }
    val expected = (for {
      (li, ls, le) <- left
      (ri, rs, re) <- right
      if ls < re && rs < le
    } yield (li, ri)).toSet

    import spark.implicits._
    val ldf = left.toDF("lid", "ls", "le")
    val rdf = right.toDF("rid", "rs", "re")
    for (binSize <- Seq(10.0, 80.0, 500.0)) {
      val got = IntervalJoin
        .overlap(ldf, "ls", "le", rdf, "rs", "re", binSize)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at binSize=$binSize")
      assert(got.toSet === expected, s"wrong pairs at binSize=$binSize")
    }
  }

  test("overlap join with equality keys partitions by key") {
    import spark.implicits._
    val ldf = Seq(("c1", 0.0, 10.0, 1L), ("c2", 0.0, 10.0, 2L)).toDF("lk", "ls", "le", "lid")
    val rdf = Seq(("c1", 5.0, 6.0, 10L), ("c2", 20.0, 30.0, 20L)).toDF("rk", "rs", "re", "rid")
    val got = IntervalJoin
      .overlap(ldf, "ls", "le", rdf, "rs", "re", 10.0, keys = Seq("lk" -> "rk"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L))) // c2 intervals don't overlap; no cross-key pairs
  }

  test("point-in-interval join matches oracle, negative coords included") {
    val rnd = new scala.util.Random(11)
    val ivs = (0 until 200).map { i =>
      val s = rnd.nextDouble() * 400 - 200
      (i.toLong, s, s + rnd.nextDouble() * 50)
    }
    val pts = (0 until 500).map(i => (i.toLong, rnd.nextDouble() * 400 - 200))
    val expected = (for {
      (ii, s, e) <- ivs
      (pi, p) <- pts
      if p >= s && p < e
    } yield (ii, pi)).toSet

    import spark.implicits._
    val idf = ivs.toDF("iid", "s", "e")
    val pdf = pts.toDF("pid", "p")
    for (binSize <- Seq(7.0, 64.0)) {
      val got = IntervalJoin
        .pointInInterval(idf, "s", "e", pdf, "p", binSize, broadcastLeft = true)
        .select("iid", "pid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size)
      assert(got.toSet === expected, s"binSize=$binSize")
    }
  }

  test("half-open semantics: touching intervals do not overlap") {
    import spark.implicits._
    val ldf = Seq((1L, 0.0, 10.0)).toDF("lid", "ls", "le")
    val rdf = Seq((2L, 10.0, 20.0), (3L, 9.999, 20.0)).toDF("rid", "rs", "re")
    val got = IntervalJoin.overlap(ldf, "ls", "le", rdf, "rs", "re", 10.0)
      .select("rid").as[Long].collect().toSet
    assert(got === Set(3L))
  }
}
