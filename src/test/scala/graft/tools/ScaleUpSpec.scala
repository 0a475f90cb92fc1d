package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The scale-leg generator's anti-collapse contract. Round 13's first
  * full-catalog sf10 bench showed the ORIGINAL per-copy transforms
  * (cyclic vowel rotation / cyclic component shift) collapsing under
  * chained invocations: both live in cyclic groups of tiny order, so a
  * 10×10 chain reused net transforms and produced identical cross-copy
  * rows — 4.77M identical text pairs at sf10 vs sf1's 25k, quadratic
  * pair-row blow-ups (d4 223×) that measured the generator, not the
  * engine. These specs pin the replacement: seeded permutations whose
  * pairwise compositions stay distinct.
  */
class ScaleUpSpec extends SparkSpec {

  import spark.implicits._

  test("letterPerm: copy 0 identity; each draw is a permutation of the alphabet") {
    assert(ScaleUp.letterPerm(0) === ScaleUp.letters)
    for (i <- 1L to 99L) {
      val p = ScaleUp.letterPerm(i)
      assert(p.sorted === ScaleUp.letters, s"copy $i not a permutation")
      assert(p !== ScaleUp.letters, s"copy $i degenerated to identity")
    }
  }

  test("letterPerm: chained compositions collide ONLY on the identity-copy symmetry") {
    // chained ScaleUp (sf0.1 -> sf1 -> sf10) applies perm_j after
    // perm_i; the net char mapping must differ across (i, j) pairs or
    // copies collapse to identical text (the r13 sf10 finding: cyclic
    // rotations left 5 nets for 100 copies). One collision family is
    // structural and accepted: copy 0 is the identity (the verbatim
    // copy the embedding query vectors need), so net(i, 0) = perm_i =
    // net(0, i) — each base doc gains at most ONE identical twin per
    // non-zero copy index (output still ~N, not N^2).
    def compose(i: Int, j: Int): String = {
      // translate maps letters(k) -> perm(k); translating twice maps
      // letters(k) -> pj(pi(k) - 'a')
      val pi = ScaleUp.letterPerm(i)
      val pj = ScaleUp.letterPerm(j)
      pi.map(d => pj(d - 'a'))
    }
    val nets = for (i <- 0 until 10; j <- 0 until 10) yield ((i, j), compose(i, j))
    assert(nets.map(_._2).distinct.size === 91)
    val byNet = nets.groupBy(_._2).filter(_._2.size > 1)
    assert(byNet.size === 9)
    for ((_, members) <- byNet) {
      val ks = members.map(_._1)
      assert(ks.size === 2 && ks.map(k => Set(k._1, k._2)).distinct.size === 1 &&
        ks.forall(k => k._1 == 0 || k._2 == 0),
        s"non-identity collision: $ks")
    }
  }

  test("componentPerm: identity at copy 0, distinct permutations and compositions at dim 64") {
    val dim = 64
    assert(ScaleUp.componentPerm(0, dim).toSeq === (0 until dim))
    def compose(i: Int, j: Int): Seq[Int] = {
      // out1[k] = in[pi[k]]; out2[k] = out1[pj[k]] = in[pi[pj[k]]]
      val pi = ScaleUp.componentPerm(i, dim)
      val pj = ScaleUp.componentPerm(j, dim)
      pj.map(pi(_)).toSeq
    }
    val nets = for (i <- 0 until 10; j <- 0 until 10) yield compose(i, j)
    // 91 = 100 minus the 9 structural identity-copy collisions
    // (net(i, 0) = net(0, i)); see the letterPerm composition spec
    assert(nets.distinct.size === 91)
  }

  test("scaleDocuments: chained 3x3 keeps every copy of a doc textually distinct") {
    val df = Seq((0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val once = ScaleUp.scaleDocuments(df, 3)
    val twice = ScaleUp.scaleDocuments(once, 3)
    assert(twice.count() === 18)
    // identity copy survives the chain verbatim
    assert(twice.filter($"text" === df.head.getString(1)).count() === 1)
    val perDoc = twice
      .withColumn("base", $"doc_id" % 2)
      .groupBy("base").agg(countDistinct("text").as("n"))
      .collect().map(_.getLong(1))
    // 7 = 9 copies minus the 2 structural identity-copy twins
    // ((1,0)~(0,1) and (2,0)~(0,2)); anything lower is a collapse
    assert(perDoc.forall(_ === 7), s"copies collapsed: ${perDoc.toSeq}")
    // the permutation preserves length and whitespace structure
    val lens = twice.select(length($"text")).distinct().collect().map(_.getInt(0))
    assert(lens.toSet === df.select(length($"text")).collect().map(_.getInt(0)).toSet)
  }

  test("scaleEmbeddings: within-copy dot products exact, cross-copy vectors distinct") {
    val v1 = Array.tabulate(8)(i => i.toFloat)
    val v2 = Array.tabulate(8)(i => (8 - i).toFloat)
    val df = Seq((0L, v1), (1L, v2)).toDF("vec_id", "embedding")
    val out = ScaleUp.scaleEmbeddings(ScaleUp.scaleEmbeddings(df, 3), 3)
    assert(out.count() === 18)
    val rows = out.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // 9 copies of vec 0: all distinct component orders
    val copies0 = rows.keys.toSeq.sorted.filter(_ % 2 == 0).map(rows)
    // 7 of 9: the two identity-copy twins are structural (see above)
    assert(copies0.map(_.toSeq).distinct.size === 7)
    // every copy preserves the within-copy dot product exactly (both
    // vectors of one copy carry the SAME permutation)
    def dot(a: Array[Float], b: Array[Float]) = a.zip(b).map { case (x, y) => x * y }.sum
    val want = dot(v1, v2)
    for (k <- rows.keys if k % 2 == 0)
      assert(dot(rows(k), rows(k + 1)) === want, s"copy pair $k")
  }
}
