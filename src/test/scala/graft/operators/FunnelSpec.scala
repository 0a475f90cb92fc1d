package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  // (user, ts, event_id, type)
  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toSeq.toDF("user_id", "ts", "event_id", "event_type")

  test("strict subsequence: out-of-order and missing steps do not convert") {
    val events = ev(
      // user 1: full ordered funnel
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      // user 2: purchase BEFORE the view -> reaches step 1 only
      (2L, 10L, 4L, "purchase"), (2L, 20L, 5L, "view"),
      // user 3: view then purchase, no click -> step 1 only
      (3L, 10L, 6L, "view"), (3L, 30L, 7L, "purchase"),
      // user 4: click only, never views -> reaches nothing
      (4L, 10L, 8L, "click"))
    val got = Funnel.funnelSteps(events, "user_id", "event_type", "ts", "event_id", steps)
      .select("user_id", "step").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)))
  }

  test("equal-ts events break ties by the tiebreak column, strictly after") {
    val events = ev(
      // click at the SAME ts as view but later event_id: counts
      (1L, 10L, 1L, "view"), (1L, 10L, 2L, "click"),
      // click at the same ts but EARLIER event_id: does not count
      (2L, 10L, 5L, "view"), (2L, 10L, 4L, "click"))
    val got = Funnel.funnelSteps(events, "user_id", "event_type", "ts", "event_id", steps)
      .select("user_id", "step").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("report: counts nest downward, conversion in integer basis points") {
    val events = ev(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      (2L, 10L, 4L, "view"), (2L, 20L, 5L, "click"),
      (3L, 10L, 6L, "view"),
      (4L, 10L, 7L, "signup"))
    val rows = Funnel.funnelReport(events, "user_id", "event_type", "ts", "event_id", steps)
      .select("step", "n_users", "conv_bp").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows(1L) === ((3L, 7500L)), s"3 of 4 users viewed: $rows") // 3*10000 div 4
    assert(rows(2L) === ((2L, 6666L)), "2 of 3 viewers clicked (floor)")
    assert(rows(3L) === ((1L, 5000L)), "1 of 2 clickers purchased")
  }

  test("windowed funnel: conversion only within the gap of the previous step") {
    val events = ev(
      // user 1 converts fully inside the 50-unit window
      (1L, 10L, 1L, "view"), (1L, 40L, 2L, "click"), (1L, 80L, 3L, "purchase"),
      // user 2's click lands beyond the window of the first view
      (2L, 10L, 4L, "view"), (2L, 100L, 5L, "click"),
      // user 3: first-occurrence anchor — the SECOND click would put
      // purchase in range, but matching anchors on the earliest click
      (3L, 10L, 6L, "view"), (3L, 20L, 7L, "click"), (3L, 60L, 8L, "click"),
      (3L, 100L, 9L, "purchase"))
    val got = Funnel.funnelSteps(events, "user_id", "event_type", "ts", "event_id",
      steps, maxGapNs = Some(50L))
      .select("user_id", "step").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (3L, 2L)))
    // and with no gap everyone converts as before
    val open = Funnel.funnelSteps(events, "user_id", "event_type", "ts", "event_id", steps)
      .select("user_id", "step").as[(Long, Long)].collect().toSet
    assert(open === Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 3L)))
  }

  test("a step nobody reaches emits no row") {
    val events = ev((1L, 10L, 1L, "view"), (2L, 20L, 2L, "view"))
    val rows = Funnel.funnelReport(events, "user_id", "event_type", "ts", "event_id", steps)
      .select("step").as[Long].collect().toSet
    assert(rows === Set(1L))
  }
}
