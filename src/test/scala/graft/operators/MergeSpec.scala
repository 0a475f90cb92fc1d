package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC / upsert merge (c13, ev13): SCD-1 semantics on a hand-built
  * change batch, replay idempotence (the streaming log's at-least-once
  * contract), the no-base-shuffle plan shape, and the streaming delta
  * log resolving to the batch snapshot across genuine micro-batch
  * boundaries.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base: DataFrame =
    Seq((1L, "one", 3L), (2L, "two", 3L), (3L, "three", 5L), (4L, "four", 4L))
      .toDF("k", "body", "n")

  // k=2 update; k=3 update v1 then tombstone v2; k=4 untouched;
  // k=5 plain insert; k=6 insert v1 then update v2
  private def changes: DataFrame =
    Seq(
      (2L, "TWO", 3L, "U", 1L),
      (3L, "THREE", 5L, "U", 1L),
      (3L, "three", 5L, "D", 2L),
      (5L, "five", 4L, "I", 1L),
      (6L, "six", 3L, "I", 1L),
      (6L, "six v2", 6L, "U", 2L))
      .toDF("k", "body", "n", "op", "version")

  private val expected = Set(
    (1L, "one", 3L), (2L, "TWO", 3L), (4L, "four", 4L),
    (5L, "five", 4L), (6L, "six v2", 6L))

  private def snap(df: DataFrame): Set[(Long, String, Long)] =
    df.select("k", "body", "n").as[(Long, String, Long)].collect().toSet

  test("upsert: update, tombstone-over-update, insert, insert-then-update") {
    assert(snap(Merge.upsert(base, changes, "k")) === expected)
  }

  test("upsert is idempotent to a replayed (duplicated) change log") {
    // foreachBatch is at-least-once: a crashed epoch can append its
    // winners twice. The resolve's argmax must not care.
    assert(snap(Merge.upsert(base, changes.unionAll(changes), "k")) === expected)
  }

  test("winners keeps op AND version so logs can re-resolve later") {
    val w = Merge.winners(changes, "k", Seq("k", "body", "n"))
      .as[(Long, String, Long, String, Long)].collect().toSet
    assert(w === Set(
      (2L, "TWO", 3L, "U", 1L),
      (3L, "three", 5L, "D", 2L),
      (5L, "five", 4L, "I", 1L),
      (6L, "six v2", 6L, "U", 2L)))
  }

  test("plan: base side never exchanges — broadcast anti-join, one batch agg") {
    val plan = graft.queries.Queries.c13_cdc_upsert(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"anti-join against the batch-sized winner key set must broadcast:\n$plan")
    // shuffles touch only the change batch: the winner max_by and the
    // anti-join's key-set distinct (Catalyst plans the cheaper keys-only
    // agg rather than reusing the max_by — both partial+final, both
    // batch-sized). The base subtree is scan→filter straight into the
    // broadcast join: no exchange carries base columns.
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"only the change batch may shuffle:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("text#")),
      s"no exchange may carry base data columns:\n$plan")
  }

  test("timeline == stats of the materialized snapshot at every version") {
    val metrics = Seq("total_n" -> col("n"), "body_len" -> length(col("body")))
    def statsOf(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("n")), sum(length(col("body"))))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val want = (0L to 2L).map { v =>
      val snap = if (v == 0L) base
        else Merge.upsert(base, changes.where(col("version") <= v), "k")
      v -> statsOf(snap)
    }.toMap
    val gotT = Merge.timeline(base, changes, "k", Seq(1L, 2L), metrics)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(gotT === want, s"timeline $gotT vs materialized $want")
  }

  test("timeline plan: broadcast semi-join fetches base contributions; " +
      "no exchange carries base data columns") {
    val plan = graft.queries.Queries.c16_corpus_timeline(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"base-contribution fetch must be a broadcast semi-join:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("text#")),
      s"no exchange may carry base/log document bodies:\n$plan")
  }

  test("snapshotDiff(base, upsert(base, changes)) recovers the applied changes") {
    val merged = Merge.upsert(base, changes, "k")
    val diff = Merge.snapshotDiff(base, merged, "k",
      md5(concat_ws("|", col("body"), col("n"))))
      .select("k", "status").as[(Long, String)].collect().toMap
    // k=1 untouched -> absent; k=2 updated; k=3 tombstoned; k=5/6 inserted
    assert(diff === Map(2L -> "modified", 3L -> "removed",
      5L -> "added", 6L -> "added"), s"diff: $diff")
    // self-diff is empty (no false positives from the fingerprint)
    assert(Merge.snapshotDiff(base, base, "k", md5(col("body"))).isEmpty)
  }

  test("streaming delta log == batch snapshot across >= 3 micro-batches") {
    val docs = spark.read.parquet(s"${sf("0.001")}/documents.parquet")
    // split the doc stream into 3 time-ordered files so winners arrive
    // across genuine micro-batch boundaries (maxFilesPerTrigger=1)
    val dir = java.nio.file.Files.createTempDirectory("merge_multi")
    val rows = docs.orderBy(col("doc_id")).collect()
    val per = math.max(1, math.ceil(rows.length / 3.0).toInt)
    rows.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"mpart$i").resolve("out")
      spark.createDataFrame(java.util.Arrays.asList(chunk: _*), docs.schema)
        .coalesce(1).write.parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
      val dest = dir.resolve(f"f$i%02d.parquet")
      java.nio.file.Files.move(f.toPath, dest)
      assert(dest.toFile.setLastModified(1700000000000L + i * 60000L))
    }
    val log = java.nio.file.Files.createTempDirectory("merge_log").toString + "/log"
    graft.streaming.StreamingOps.cdcUpsertStream(
      graft.queries.Queries.docChanges(
        graft.streaming.StreamingOps.readDocuments(
          spark, s"$dir/*.parquet", maxFilesPerTrigger = Some(1))),
      "doc_id", Seq("doc_id", "text", "lang", "source", "n_chars"), log)
    // >= 3 appends happened (one per data micro-batch)
    val segs = new java.io.File(log).listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(segs >= 3, s"expected >= 3 log segments, got $segs")
    val streamed = Merge.upsert(
      docs.where(col("doc_id") % 4 =!= 3), spark.read.parquet(log), "doc_id")
    val batch = graft.queries.Queries.c13_cdc_upsert(spark, sf("0.001"))
    assert(streamed.unionAll(batch).select("doc_id").distinct().count() ===
      batch.count(), "streamed snapshot must equal the batch snapshot")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("vacuumLog: replaying the vacuumed log reproduces every retained snapshot") {
    val retained = Seq(1L, 2L)
    val removable = Merge.vacuumLog(changes, "k", retained)
      .select("k", "version").as[(Long, Long)].collect().toSet
    // fixture truth: (3,U,1) superseded by its v2 tombstone at every
    // retained chk except chk=1... at chk=1 the winner for k=3 IS v1 —
    // so nothing for k=3 v1; (6,I,1) wins at chk=1; nothing removable
    // here until a checkpoint is dropped
    val kept = changes.join(
      Merge.vacuumLog(changes, "k", retained), Seq("k", "version"), "left_anti")
    retained.foreach { v =>
      val full = Merge.upsert(base, changes.where(col("version") <= v), "k")
        .as[(Long, String, Long)].collect().toSet
      val vac = Merge.upsert(base, kept.where(col("version") <= v), "k")
        .as[(Long, String, Long)].collect().toSet
      assert(vac === full, s"retained snapshot at version $v must survive vacuum")
    }
    // retain only the latest: every superseded entry becomes removable
    val latestOnly = Merge.vacuumLog(changes, "k", Seq(2L))
      .select("k", "version").as[(Long, Long)].collect().toSet
    assert(latestOnly === Set((3L, 1L), (6L, 1L)),
      s"superseded v1 entries must go when only v2 is retained: $latestOnly")
    assert(removable.subsetOf(latestOnly),
      "retaining more checkpoints can only keep more entries")
    // and the latest snapshot survives the aggressive vacuum
    val kept2 = changes.join(
      Merge.vacuumLog(changes, "k", Seq(2L)), Seq("k", "version"), "left_anti")
    assert(Merge.upsert(base, kept2, "k").as[(Long, String, Long)].collect().toSet
      === Merge.upsert(base, changes, "k").as[(Long, String, Long)].collect().toSet)
    // entries newer than the newest retained checkpoint are future
    // state, never removable
    val withFuture = changes.unionByName(
      Seq((2L, "TWO v3", 3L, "U", 9L)).toDF("k", "body", "n", "op", "version"))
    assert(!Merge.vacuumLog(withFuture, "k", Seq(2L))
      .select("version").as[Long].collect().contains(9L))
  }

  test("scd2History: is_current slice IS the SCD-1 upsert snapshot") {
    val docs = spark.read.parquet(s"${sf("0.001")}/documents.parquet")
    val base = docs.where(col("doc_id") % 4 =!= 3)
    val ch = graft.queries.Queries.docChanges(docs)
    val hist = Merge.scd2History(base, ch, "doc_id")
    val current = hist.where(col("is_current"))
      .select(base.columns.map(col): _*)
    val snap = Merge.upsert(base, ch, "doc_id")
    assert(current.exceptAll(snap).isEmpty && snap.exceptAll(current).isEmpty,
      "current rows must equal the latest-wins snapshot")
  }

  test("scd2History: intervals chain without gaps; tombstoned keys have no current row") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${sf("0.001")}/documents.parquet")
    val base = docs.where(col("doc_id") % 4 =!= 3)
    val hist = Merge.scd2History(base, graft.queries.Queries.docChanges(docs),
      "doc_id")
    // every bounded interval is properly ordered
    assert(hist.where(col("valid_to").isNotNull &&
      col("valid_to") <= col("valid_from")).count() === 0)
    // successor's valid_from == predecessor's valid_to (lead chaining):
    // for each key, sorted valid_froms must equal sorted non-null
    // valid_tos shifted by one opening at the key's first version
    val bad = hist.groupBy("doc_id")
      .agg(sort_array(collect_list("valid_from")).as("froms"),
        sort_array(collect_list("valid_to")).as("tos"))
      // drop the FIRST from (the opening) and any trailing open interval;
      // what remains of froms must be a subset of tos
      .where(!expr("slice(froms, 2, size(froms) - 1)")
        .eqNullSafe(expr(
          "slice(tos, 1, greatest(size(froms) - 1, 0))")))
      .count()
    assert(bad === 0, "interval chains must be gap-free")
    // a doc deleted at v2 (doc_id % 6 == 0) never has a current row
    assert(hist.where(col("doc_id") % 6 === 0 && col("is_current"))
      .count() === 0)
  }
}
