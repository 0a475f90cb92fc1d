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
  * engine. Round 14 closed the residual identity-copy symmetry
  * (P_i∘id = id∘P_i gave every base doc 9 identical twins at sf10 —
  * 44,856 pairs vs sf1's 80) by salting the seed per invocation.
  * These specs pin the replacement: seeded permutations whose pairwise
  * compositions across distinct-salt invocations are ALL distinct.
  */
class ScaleUpSpec extends SparkSpec {

  import spark.implicits._

  test("letterPerm: copy 0 identity; each draw is a permutation of the alphabet") {
    for (salt <- Seq(0L, 17L, -9L)) {
      assert(ScaleUp.letterPerm(0, salt) === ScaleUp.letters)
      for (i <- 1L to 99L) {
        val p = ScaleUp.letterPerm(i, salt)
        assert(p.sorted === ScaleUp.letters, s"copy $i salt $salt not a permutation")
        assert(p !== ScaleUp.letters, s"copy $i salt $salt degenerated to identity")
      }
    }
  }

  test("letterPerm: distinct-salt chained compositions never collide") {
    // chained ScaleUp (sf0.1 -> sf1 -> sf10) applies perm_j (step-2
    // salt) after perm_i (step-1 salt); the net char mapping must
    // differ across ALL (i, j) pairs or copies collapse to identical
    // text. With one shared salt the identity copy is symmetric
    // (net(i, 0) = perm_i = net(0, i)); main salts by input path, so
    // the two steps draw unrelated non-identity families and even the
    // identity-copy nets are distinct.
    def compose(i: Int, j: Int, s1: Long, s2: Long): String = {
      // translate maps letters(k) -> perm(k); translating twice maps
      // letters(k) -> pj(pi(k) - 'a')
      val pi = ScaleUp.letterPerm(i, s1)
      val pj = ScaleUp.letterPerm(j, s2)
      pi.map(d => pj(d - 'a'))
    }
    val nets = for (i <- 0 until 10; j <- 0 until 10)
      yield ((i, j), compose(i, j, 1L, 2L))
    assert(nets.map(_._2).distinct.size === 100,
      "chained 10x10 must yield 100 distinct net mappings")
    // the degenerate same-salt chain keeps exactly the 9 structural
    // identity-copy collisions — pinned so a seed regression (back to
    // a small cyclic family) cannot hide behind the salt
    val sameSalt = for (i <- 0 until 10; j <- 0 until 10)
      yield compose(i, j, 1L, 1L)
    assert(sameSalt.distinct.size === 91)
  }

  test("componentPerm: identity at copy 0, all-distinct salted compositions at dim 64") {
    val dim = 64
    for (salt <- Seq(0L, 17L))
      assert(ScaleUp.componentPerm(0, dim, salt).toSeq === (0 until dim))
    def compose(i: Int, j: Int, s1: Long, s2: Long): Seq[Int] = {
      // out1[k] = in[pi[k]]; out2[k] = out1[pj[k]] = in[pi[pj[k]]]
      val pi = ScaleUp.componentPerm(i, dim, s1)
      val pj = ScaleUp.componentPerm(j, dim, s2)
      pj.map(pi(_)).toSeq
    }
    val nets = for (i <- 0 until 10; j <- 0 until 10) yield compose(i, j, 1L, 2L)
    assert(nets.distinct.size === 100)
  }

  test("scaleDocuments: salted chained 3x3 keeps every copy of a doc textually distinct") {
    val df = Seq((0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val once = ScaleUp.scaleDocuments(df, 3, salt = 1L)
    val twice = ScaleUp.scaleDocuments(once, 3, salt = 2L)
    assert(twice.count() === 18)
    // identity copy survives the chain verbatim
    assert(twice.filter($"text" === df.head.getString(1)).count() === 1)
    val perDoc = twice
      .withColumn("base", $"doc_id" % 2)
      .groupBy("base").agg(countDistinct("text").as("n"))
      .collect().map(_.getLong(1))
    // all 9 copies distinct: distinct salts remove even the
    // identity-copy twins a shared salt would leave
    assert(perDoc.forall(_ === 9), s"copies collapsed: ${perDoc.toSeq}")
    // the permutation preserves length and whitespace structure
    val lens = twice.select(length($"text")).distinct().collect().map(_.getInt(0))
    assert(lens.toSet === df.select(length($"text")).collect().map(_.getInt(0)).toSet)
  }

  test("scaleEmbeddings: within-copy dot products exact, cross-copy vectors distinct") {
    val v1 = Array.tabulate(8)(i => i.toFloat)
    val v2 = Array.tabulate(8)(i => (8 - i).toFloat)
    val df = Seq((0L, v1), (1L, v2)).toDF("vec_id", "embedding")
    val out = ScaleUp.scaleEmbeddings(
      ScaleUp.scaleEmbeddings(df, 3, salt = 1L), 3, salt = 2L)
    assert(out.count() === 18)
    val rows = out.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // 9 copies of vec 0: all distinct component orders under distinct salts
    val copies0 = rows.keys.toSeq.sorted.filter(_ % 2 == 0).map(rows)
    assert(copies0.map(_.toSeq).distinct.size === 9)
    // every copy preserves the within-copy dot product exactly (both
    // vectors of one copy carry the SAME permutation)
    def dot(a: Array[Float], b: Array[Float]) = a.zip(b).map { case (x, y) => x * y }.sum
    val want = dot(v1, v2)
    for (k <- rows.keys if k % 2 == 0)
      assert(dot(rows(k), rows(k + 1)) === want, s"copy pair $k")
  }
}
