package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedFuzzySpec extends SparkSpec {

  // ---- j9: bucketed co-located join -------------------------------

  test("bucketed join plans with zero Exchange and zero Sort; plain join shuffles") {
    val plan = BucketedJoin.colocatedJoin(spark, sf("0.001"), nBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"), plan)
    // one file per bucket (repartition-before-write) + the sorted-scan
    // flag => sortBy metadata satisfies the join's sort requirement too
    // (since 3.0 Spark only trusts bucket sort under this conf, because
    // multi-file buckets would need a merge — our layout is one file)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val sorted = BucketedJoin.colocatedJoin(spark, sf("0.001"), nBuckets = 8)
        .queryExecution.executedPlan.toString
      assert(!sorted.contains("Exchange"), sorted)
      assert(!sorted.contains("Sort ["), s"bucketed+sorted scan must not re-sort:\n$sorted")
    } finally spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    // contrast: the same join off raw parquet shuffles both sides
    val li = spark.read.parquet(sf("0.001") + "/lineitem.parquet")
    val ord = spark.read.parquet(sf("0.001") + "/orders.parquet")
    val rawPlan = li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(rawPlan).size >= 2, rawPlan)
  }

  test("bucketed join result equals the plain join (layout is invisible)") {
    val got = BucketedJoin.revenueByPriority(spark, sf("0.001"), nBuckets = 8)
      .orderBy("o_orderpriority").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val li = spark.read.parquet(sf("0.001") + "/lineitem.parquet")
    val ord = spark.read.parquet(sf("0.001") + "/orders.parquet")
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val pct = lit(100L) - round(col("l_discount") * 100).cast("long")
    val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), round(sum(cents * pct) / lit(10000.0), 2).as("revenue"))
      .orderBy("o_orderpriority").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("ensureBucketed is idempotent per session (one catalog entry, reused)") {
    val t1 = BucketedJoin.ensureBucketed(spark, sf("0.001") + "/orders.parquet", "o_orderkey", 8)
    val t2 = BucketedJoin.ensureBucketed(spark, sf("0.001") + "/orders.parquet", "o_orderkey", 8)
    assert(t1 === t2)
    assert(spark.catalog.tableExists(t1))
  }

  test("deriveBuckets: bytes-derived from the larger side, clamped [4, 4096]") {
    // tiny SF legs sit at the floor — no 32-bucket 350 KB-file layouts
    assert(BucketedJoin.deriveBuckets(Seq(
      sf("0.001") + "/lineitem.parquet", sf("0.001") + "/orders.parquet")) === 4)
    // the count follows the LARGER side (both sides must share it)
    val bpp = graft.util.Tuning.BytesPerPartition
    assert(BucketedJoin.deriveBuckets(Seq("/nonexistent")) === 4)
    // distinct counts get distinct catalog names: differently-sized
    // layouts of the same path never collide in a shared session
    assert(BucketedJoin.tableName("/x/y/orders.parquet", 4) !==
      BucketedJoin.tableName("/x/y/orders.parquet", 8))
    assert(bpp === 64L << 20)
    // the pure rule above the floor and cap (ADVICE r17: the fixture
    // cases only ever hit the floor of 4)
    assert(BucketedJoin.bucketsForBytes(0L) === 4)
    assert(BucketedJoin.bucketsForBytes(bpp) === 4) // 1 by bytes -> floor
    assert(BucketedJoin.bucketsForBytes(100 * bpp) === 100) // ceil rules
    assert(BucketedJoin.bucketsForBytes(100 * bpp + 1) === 101)
    assert(BucketedJoin.bucketsForBytes(bpp * 6000) === 4096) // cap
    assert(BucketedJoin.bucketsForBytes(Long.MaxValue / 4) === 4096)
  }

  // ---- j10: deletion-blocked edit-distance join --------------------

  /** plain Levenshtein, the naive reference */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def naivePairs(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d)).toSet

  private def opPairs(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    FuzzyJoin.editDistanceSelfJoin(rows.toDF("id", "s"), "id", "s", maxDist = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("fuzzy join == naive quadratic contract on a seeded random corpus (k=1 and k=2)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    // clustered strings: a few seeds, mutated copies, plus junk — the
    // regime with real matches at k<=2
    val seeds = Seq.fill(8)((1 to (3 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val rows = (0 until 120).map { i =>
      val s = seeds(rnd.nextInt(seeds.size))
      val mutated = s.map(c => if (rnd.nextInt(8) == 0) alpha(rnd.nextInt(alpha.length)) else c)
      val ins = if (rnd.nextInt(4) == 0) mutated + alpha(rnd.nextInt(alpha.length)) else mutated
      (i.toLong, ins)
    }
    for (k <- Seq(1, 2))
      assert(opPairs(rows, k) === naivePairs(rows, k), s"k=$k")
  }

  test("fuzzy join exact recall on short strings (disjoint-gram regime)") {
    // "ab"/"cd" share NOTHING except the empty 2-deletion variant; ""/
    // single chars exercise the degenerate neighborhood
    val rows = Seq((1L, "ab"), (2L, "cd"), (3L, "a"), (4L, "abc"), (5L, "xbc"), (6L, ""))
    for (k <- Seq(1, 2))
      assert(opPairs(rows, k) === naivePairs(rows, k), s"k=$k")
  }

  test("fuzzy join is exact on low-entropy boilerplate names (the anti-gram corpus)") {
    // every string shares the "Entity#000" boilerplate; matches differ
    // only in the digit tail. Gram-prefix blocking degrades to ~all
    // pairs here (see FuzzyJoin scaladoc); deletion blocking must stay
    // exact AND the d=0 duplicate groups must all appear.
    val rows = (0 until 200).map(i => (i.toLong, f"Entity#${i % 50}%09d"))
    val got = opPairs(rows, 1)
    assert(got === naivePairs(rows, 1))
    assert(got.exists(_._3 == 0))
  }

  test("deletionVariants: counts, membership, dedup") {
    val v1 = FuzzyJoin.deletionVariants("abc", 1)
    assert(v1.toSet === Set("abc", "bc", "ac", "ab"))
    val v2 = FuzzyJoin.deletionVariants("abc", 2).toSet
    assert(v2 === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    // repeated chars dedup: "aaa" has ONE distinct 1-deletion
    assert(FuzzyJoin.deletionVariants("aaa", 1).toSet === Set("aaa", "aa"))
    assert(FuzzyJoin.deletionVariants("", 2).toSet === Set(""))
  }
}
