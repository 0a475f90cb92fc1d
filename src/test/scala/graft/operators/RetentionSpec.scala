package graft.operators

import graft.SparkSpec

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private val P = 100L // tiny period for readable fixtures

  // (user, ts)
  private def ev(rows: (Long, Long)*) =
    rows.toSeq.toDF("user_id", "ts")

  test("retention triangle: counts, offsets, and basis points") {
    val events = ev(
      // cohort 0: users 1,2 start in period 0; 1 returns in 1 and 2, 2 never
      (1L, 10L), (1L, 110L), (1L, 250L),
      (2L, 50L),
      // cohort 1: user 3 starts in period 1, returns in period 2
      (3L, 150L), (3L, 260L))
    val got = Retention.cohortRetention(events, "user_id", "ts", P)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got((0L, 0L)) === ((2L, 10000L)))
    assert(got((0L, 1L)) === ((1L, 5000L)))
    assert(got((0L, 2L)) === ((1L, 5000L)))
    assert(got((1L, 0L)) === ((1L, 10000L)))
    assert(got((1L, 1L)) === ((1L, 10000L)))
    assert(got.size === 5)
  }

  test("multiple events in one period count the user once") {
    val events = ev((1L, 10L), (1L, 20L), (1L, 30L), (1L, 110L), (1L, 115L))
    val got = Retention.cohortRetention(events, "user_id", "ts", P)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L))
  }

  test("offset-0 always carries 10000 bp and every offset row has a base") {
    val events = ev((1L, 5L), (2L, 105L), (2L, 205L), (3L, 205L), (1L, 305L))
    val rows = Retention.cohortRetention(events, "user_id", "ts", P)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.filter(_._2 == 0L).forall(_._4 == 10000L))
    assert(rows.nonEmpty)
  }
}
