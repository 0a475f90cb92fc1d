package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0 until 200).map(i => (i.toLong, s"token$i content word ${i % 7} tail"))
      .toDF("doc_id", "text")
  }

  test("shard assignment is deterministic and in range") {
    import spark.implicits._
    val a = Sharding.assignShards(docs, "doc_id", 16)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val b = Sharding.assignShards(docs, "doc_id", 16)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.values.forall(s => s >= 0 && s < 16))
    // uniform md5 ticket: 200 docs over 16 shards should hit most shards
    assert(a.values.toSet.size >= 12)
  }

  test("manifest totals equal whole-corpus totals") {
    import spark.implicits._
    val m = Sharding.shardManifest(docs, "doc_id", "text", 16)
    val (nd, nt, nc) = m.agg(sum("n_docs"), sum("n_tokens"), sum("n_chars"))
      .as[(Long, Long, Long)].head()
    val (ed, et, ec) = docs.agg(
      count(lit(1)),
      sum(size(split(col("text"), " ")).cast("long")),
      sum(length(col("text")).cast("long"))).as[(Long, Long, Long)].head()
    assert((nd, nt, nc) === ((ed, et, ec)))
  }

  test("content checksum is order- and partitioning-independent") {
    import spark.implicits._
    val base = Sharding.shardManifest(docs, "doc_id", "text", 8)
      .select("shard", "content_fp").as[(Long, Long)].collect().toMap
    val shuffled = Sharding.shardManifest(
      docs.orderBy(rand(42)).repartition(7), "doc_id", "text", 8)
      .select("shard", "content_fp").as[(Long, Long)].collect().toMap
    assert(base === shuffled)
  }

  test("training order is a 0..N-1 permutation matching the ticket total order") {
    import spark.implicits._
    val got = Sharding.trainingOrder(docs, "doc_id", numBuckets = 5)
      .select("doc_id", "position").as[(Long, Long)].collect()
    assert(got.map(_._2).sorted.toSeq === (0L until 200L))
    // positions must follow the (ticket, id) total order exactly
    val tick = docs.select(col("doc_id"),
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(10000L)).as("tk"))
      .as[(Long, Long)].collect().toMap
    val expected = got.map(_._1).sortBy(id => (tick(id), id)).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(got.toMap === expected)
    // independent of bucket count
    val other = Sharding.trainingOrder(docs, "doc_id", numBuckets = 2)
      .select("doc_id", "position").as[(Long, Long)].collect().toMap
    assert(other === expected)
  }

  test("unigram LM scores common-word docs lower than rare-word docs") {
    import spark.implicits._
    // "the" dominates the corpus; doc 3 is all-rare
    val d = Seq(
      (1L, "the the the the the the the the"),
      (2L, "the the the the cat cat dog dog"),
      (3L, "zyx wvu tsr qpo nml kji hgf edc")
    ).toDF("doc_id", "text")
    val s = TextAnalysis.unigramLogPpl(d, "doc_id", "text")
      .select("doc_id", "bits_per_token").as[(Long, Double)].collect().toMap
    assert(s(1L) < s(2L) && s(2L) < s(3L))
    // closed form for doc 1: p(the)=12/24 -> exactly 1 bit/token
    assert(math.abs(s(1L) - 1.0) < 1e-9)
  }

  test("bigram LM: context drops bits below unigram; closed form on a planted doc") {
    import spark.implicits._
    // doc 1's bigrams are fully deterministic (a b a b ...): with context
    // it must score FAR below its unigram bits; doc 2 breaks the pattern
    val d = Seq(
      (1L, "a b a b a b a b a b a b"),
      (2L, "a a b b a b b a a b a b")
    ).toDF("doc_id", "text")
    val bi = TextAnalysis.bigramLogPpl(d, "doc_id", "text")
      .select("doc_id", "bits_per_token").as[(Long, Double)].collect().toMap
    val un = TextAnalysis.unigramLogPpl(d, "doc_id", "text")
      .select("doc_id", "bits_per_token").as[(Long, Double)].collect().toMap
    assert(bi(1L) < un(1L), s"context must help the periodic doc: $bi vs $un")
    assert(bi(1L) < bi(2L), "the pattern-breaking doc scores more bits")
    // closed form for doc 1: 11 interior tokens, each with
    // p = 0.75 * cb/cc + 0.25 * 12/24; cb/cc: after 'a' (cc=11 contexts,
    // a->b 6+4=10... compute directly from corpus pair counts instead:
    val pairs = d.as[(Long, String)].collect().flatMap { case (_, t) =>
      val ts = t.split(" ")
      ts.zipWithIndex.map { case (w, i) => (if (i > 0) ts(i - 1) else null, w) }
    }
    val uni = pairs.groupBy(_._2).map { case (k, v) => k -> v.size }
    val tot = uni.values.sum.toDouble
    val biC = pairs.filter(_._1 != null).groupBy(identity).map { case (k, v) => k -> v.size }
    val ctx = pairs.filter(_._1 != null).groupBy(_._1).map { case (k, v) => k -> v.size }
    def bits(text: String): Double = {
      val ts = text.split(" ")
      val terms = ts.zipWithIndex.map { case (w, i) =>
        val pu = uni(w) / tot
        val p = if (i == 0) pu
        else 0.75 * (biC((ts(i - 1), w)).toDouble / ctx(ts(i - 1))) + 0.25 * pu
        -math.log(p) / math.log(2.0)
      }
      BigDecimal(terms.sum / ts.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(bi(1L) - bits("a b a b a b a b a b a b")) < 2e-4)
    assert(math.abs(bi(2L) - bits("a a b b a b b a a b a b")) < 2e-4)
  }

  test("quality rule mask packs exactly the failing rule bits") {
    import spark.implicits._
    val d = Seq(
      (1L, "the a of and to in " + (1 to 60).map(i => s"w$i").mkString(" ")), // healthy
      (2L, "a b"), // too short + others
      (3L, ("the of and to in a " + Seq.fill(60)("dup").mkString(" "))) // repetitive
    ).toDF("doc_id", "text")
    val rules = TextAnalysis.qualityRules(col("text"))
    val mask = TextAnalysis.qualityFailMask(rules)
    val out = d.select(
      (Seq(col("doc_id")) ++ rules.map { case (n, c) => c.as(n) } :+ mask.as("m")): _*)
      .collect()
    out.foreach { r =>
      val flags = (1 to 6).map(i => r.getBoolean(i))
      val expected = flags.zipWithIndex.map { case (f, i) => if (f) 1L << i else 0L }.sum
      assert(r.getLong(7) === expected)
    }
    // doc 1 passes every rule; doc 3 fails the repetition rule
    val byId = out.map(r => r.getLong(0) -> r.getLong(7)).toMap
    assert(byId(1L) === 0L)
    assert((byId(3L) & 16L) === 16L)
  }

  test("prepareShards: quality-fail and high-perplexity docs never reach the manifest") {
    import spark.implicits._
    val common = (1 to 60).map(i => s"w${i % 25}") ++ Seq("the", "a", "of", "and")
    val corpus = (0 until 40).map { i =>
      (i.toLong, (common ++ Seq(s"tail$i")).mkString(" "))   // healthy docs
    } ++ Seq(
      (100L, "a b"),                                          // fails r_too_short
      (101L, (1 to 64).map(i => s"rareword$i${"x" * 3}").mkString(" ") +
        " the a of and " + (1 to 10).map(i => s"alsorare$i").mkString(" "))) // all-rare -> high bits/token
    val df = corpus.toDF("doc_id", "text")
    val m = Pipeline.prepareShards(df, "doc_id", "text",
      maxBitsPerToken = 6.0, numShards = 4)
    val total = m.agg(sum("n_docs")).as[Long].head()
    assert(total === 40, s"expected only the 40 healthy docs, got $total")
  }

  test("chunking: stride overlap, short tail, null text, full coverage") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "solo"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Sampling.chunkDocuments(d, "doc_id", "text", window = 4, stride = 3)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // doc 1: starts 0,3,6,9 -> windows of 4,4,4,1
    assert(got(1L).map(_._3).toSeq === Seq(4L, 4L, 4L, 1L))
    assert(got(1L).head._4 === "t1 t2 t3 t4")
    assert(got(1L)(1)._4 === "t4 t5 t6 t7") // stride-3 overlap of 1 token
    assert(got(1L).last._4 === "t10")
    assert(got(2L).map(_._4).toSeq === Seq("solo"))
    assert(!got.contains(3L)) // null text -> no chunks
  }

  test("split assignment: total, deterministic, ratio-shaped, ingest-stable") {
    import spark.implicits._
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val a = Sharding.splitAssign(docs, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a.size === 200)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // md5 ticket is uniform: 200 docs should land ~180/10/10
    val byName = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byName("train") > 150)
    assert(byName.getOrElse("val", 0) + byName.getOrElse("test", 0) < 50)
    // incremental ingest never moves an old doc: the first-100 corpus
    // assigns each doc exactly as the full corpus does
    val early = Sharding.splitAssign(
      docs.where(col("doc_id") < 100), "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(early === a.view.filterKeys(_ < 100).toMap)
    // malformed weights are rejected, not silently renormalized
    intercept[IllegalArgumentException] {
      Sharding.splitAssign(docs, "doc_id", Seq("train" -> 80, "val" -> 5))
    }
    intercept[IllegalArgumentException] {
      Sharding.splitAssign(docs, "doc_id", Seq("train" -> 100, "val" -> 0))
    }
  }

  test("tokenBudgetFill: bucket edges, crossing doc kept, exact fill") {
    import spark.implicits._
    val d = Seq(
      ("A", 1L, 5L, 10L), ("A", 2L, 5L, 10L),
      ("A", 3L, 4L, 10L), ("A", 4L, 4L, 10L),
      ("A", 5L, 3L, 100L),
      ("B", 6L, 1L, 5L), ("B", 7L, 2L, 5L))
      .toDF("src", "id", "p", "tk")
    def fill(b: Long) = Sampling
      .tokenBudgetFill(d, "src", "id", "p", col("tk"), b)
      .select("doc_id").as[Long].collect().toSet
    // budget 35: prio-5 bucket full (20), prio-4 partial — doc 4 crosses
    // at start 30 < 35 and is KEPT; prio-3 starts at 40, dropped whole
    assert(fill(35L) === Set(1L, 2L, 3L, 4L, 6L, 7L))
    // budget 30: doc 4 starts exactly AT the budget -> dropped (exact fill)
    assert(fill(30L) === Set(1L, 2L, 3L, 6L, 7L))
    // budget beyond every stratum total: everything kept
    assert(fill(1000L) === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetFill(d, "src", "id", "p", col("tk"), 0L)
    }
  }

  test("tokenBudgetFill == the naive full per-stratum sort (random corpus)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val d = (1L to 300L).map(i =>
      (s"s${rnd.nextInt(4)}", i, rnd.nextInt(6).toLong, 1L + rnd.nextInt(30)))
      .toDF("src", "id", "p", "tk")
    val naive = d.withColumn("start",
        sum(col("tk")).over(Window.partitionBy("src")
          .orderBy(col("p").desc, col("id"))) - col("tk"))
      .where(col("start") < 100L).select(col("id")).as[Long].collect().toSet
    val got = Sampling.tokenBudgetFill(d, "src", "id", "p", col("tk"), 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(got === naive)
  }

  test("dsirResample matches a local reference implementation exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat cat cat", "tgt"), (2L, "cat cat dog", "tgt"),
      (3L, "cat cat cat", "raw"), (4L, "dog dog dog", "raw"),
      (5L, "bird bird", "raw"))
    val d = docs.toDF("doc_id", "text", "src")
    val got = Sampling
      .dsirResample(d, "doc_id", "text", col("src") === "tgt", 256, 5)
      .as[(Long, Long)].collect().toSeq

    // local replication of the contract: md5-60bit buckets, Laplace +1
    // multinomials, per-bucket micro-nat quantization, integer doc sums
    def bucket(w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 256 + 256) % 256
    }
    val occ = docs.flatMap { case (id, t, s) =>
      t.split(" +").filter(_.nonEmpty).map(w => (id, s == "tgt", bucket(w))) }
    val byB = occ.groupBy(_._3)
    val (rtot, ttot) = (occ.size.toLong, occ.count(_._2).toLong)
    val lr = byB.map { case (b, os) =>
      val (rn, tn) = (os.size.toLong, os.count(_._2).toLong)
      b -> math.floor((math.log(tn + 1.0) - math.log(ttot + 256.0)
        - math.log(rn + 1.0) + math.log(rtot + 256.0)) * 1e6 + 0.5).toLong }
    val want = occ.groupBy(_._1)
      .map { case (id, os) => id -> os.map(o => lr(o._3)).sum }.toSeq
      .sortBy { case (id, sc) => (-sc, id) }
    assert(got === want, s"got $got want $want")
    // identical texts tie and break on doc_id; k truncates the ranking
    val top2 = Sampling
      .dsirResample(d, "doc_id", "text", col("src") === "tgt", 256, 2)
      .as[(Long, Long)].collect().toSeq
    assert(top2 === want.take(2))
  }

  test("bpe pair counts: closed-form corpus, tie order, null text") {
    import spark.implicits._
    val d = Seq(
      (1L, "abc ab x"),       // abc -> ab, bc ; ab -> ab ; x too short
      (2L, "ab cd"),          // ab, cd
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(d, "text", topK = 10)
      .as[(String, Long)].collect().toSeq
    // word counts: abc=1, ab=2, cd=1 -> pairs ab=1+2=3, bc=1, cd=1
    assert(got === Seq(("ab", 3L), ("bc", 1L), ("cd", 1L)))
    // topK truncates in (n desc, pair asc) order
    val top1 = TextAnalysis.bpePairCounts(d, "text", topK = 1)
      .as[(String, Long)].collect().toSeq
    assert(top1 === Seq(("ab", 3L)))
  }

  test("bpeTrain: learned merges track the evolving pair stats") {
    import spark.implicits._
    // words: abab x3, ab x2, cd x1 (x filtered: too short)
    val d = Seq((1L, "abab ab cd x"), (2L, "abab ab"), (3L, "abab"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(d, "text", merges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    // iter1: (a,b) = 2*3 + 1*2 = 8 ; iter2: (ab,ab) = 3 ; iter3: (c,d) = 1
    assert(got === Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L), (3, "c", "d", 1L)))
  }

  test("bpeTrain applies merges simultaneously left-to-right (no overlap)") {
    import spark.implicits._
    // aaaa -> (a)(a) x3; after merge -> (aa)(aa), NOT (aa)(a)(a)'s
    // remnant pairs; then (aa,aa) once; then nothing -> early stop
    val d = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(d, "text", merges = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("bpeTokenize: trained merges collapse words; per-doc totals") {
    import spark.implicits._
    val d = Seq((1L, "abab ab cd x"), (2L, "abab ab"), (3L, "abab"))
      .toDF("doc_id", "text")
    // merges learned: (a,b) -> (ab,ab) -> (c,d); every word ends 1 token
    val got = TextAnalysis.bpeTokenize(d, "doc_id", "text", merges = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((3L, 3L)), 2L -> ((2L, 2L)), 3L -> ((1L, 1L))))
    // with only ONE merge: abab -> (ab)(ab) = 2 tokens, ab -> 1, cd -> 2
    val one = TextAnalysis.bpeTokenize(d, "doc_id", "text", merges = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one === Map(1L -> 5L, 2L -> 3L, 3L -> 2L))
  }

  test("bpeTrain tie-break: equal counts pick the (left, right) minimum") {
    import spark.implicits._
    // zy and bc both appear once; (b,c) < (z,y) lexicographically
    val d = Seq((1L, "zy bc")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(d, "text", merges = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "b", "c", 1L)))
  }

  test("quality gate drops null text via r_too_short, not a null sail-through") {
    import spark.implicits._
    val d = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rules = TextAnalysis.qualityRules(col("text"))
    val mask = TextAnalysis.qualityFailMask(rules)
    val m = d.select(mask.as("m")).as[Long].head()
    assert((m & 1L) === 1L, s"null text must fail r_too_short (mask $m)")
  }
}
