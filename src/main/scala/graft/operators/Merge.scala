package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC / upsert merge: apply a change batch to a base snapshot.
  *
  * The corpus-maintenance primitive a 100 TB training-data lake needs
  * continuously: re-crawls update documents, takedown and opt-out
  * requests delete them, new crawls insert them — and the base snapshot
  * is petabytes while a day's change batch is a few gigabytes. The whole
  * design follows from that asymmetry: the base side must never shuffle.
  *
  * Plan shape (two jobs' worth of work, one declarative plan):
  *   1. collapse the batch to one WINNING change per key with one
  *      partial+final `max_by(struct(changes), version)` aggregation —
  *      a key that saw insert→update→delete inside the batch resolves
  *      to its latest op, and a mega-touched key combines map-side
  *      instead of landing on one window reducer;
  *   2. anti-join the base against the winner KEY SET (deletes rows
  *      that were updated or tombstoned), then union the non-tombstone
  *      winners back in. The winner set inherits the batch's size, so
  *      under AQE the anti-join broadcasts and the base is a pure
  *      narrow scan→filter — zero exchange on the petabyte side. When
  *      the batch outgrows broadcast, a base bucketed on the key (see
  *      [[graft.sources.Bucketed]]) keeps its side exchange-free in the
  *      sort-merge fallback.
  *
  * Semantics (SCD type 1, latest wins):
  *   - ties on `versionCol` within a key are broken toward the LARGER
  *     op string ("U" > "I" > "D" is NOT assumed — callers must supply
  *     distinct versions per key; the struct tie-break on op then id
  *     only makes the plan deterministic, it is not a contract);
  *   - op "D" tombstones the key (row leaves the snapshot);
  *   - any other op ("I" insert, "U" update/upsert) replaces the base
  *     row wholesale — there is no column-level patching at this layer.
  *
  * Output columns = the base snapshot's columns, unchanged order.
  */
object Merge {

  /** Collapse a change set to one WINNING change per key — the latest
    * `(versionCol, opCol)` — keeping op AND version so the result can
    * serve as a delta-log segment that later merges resolve against
    * (merge-on-read). One partial+final `max_by` aggregation: skew-safe
    * (a mega-touched key combines map-side), and idempotent under the
    * at-least-once replay duplicates a streaming log append can leave
    * behind. Output columns: `dataCols` (key first) + op + version.
    */
  def winners(
      changes: DataFrame,
      keyCol: String,
      dataCols: Seq[String],
      versionCol: String = "version",
      opCol: String = "op"): DataFrame = {
    val rest = dataCols.filterNot(_ == keyCol)
    changes
      .groupBy(col(keyCol))
      .agg(max_by(
        struct((rest.map(col) :+ col(opCol) :+ col(versionCol)): _*),
        struct(col(versionCol), col(opCol))).as("w"))
      .select(col(keyCol) +: (rest.map(c => col(s"w.$c").as(c)) :+
        col(s"w.$opCol").as(opCol) :+ col(s"w.$versionCol").as(versionCol)): _*)
  }

  /** Merge `changes` (base columns + `opCol` + `versionCol`) into
    * `base`. See object doc for semantics and the no-base-shuffle plan.
    * `changes` may be a raw batch OR an accumulated delta log spanning
    * many appended micro-batches ([[graft.streaming.StreamingOps
    * .cdcUpsertStream]]): winner-picking is an argmax, so resolving the
    * whole log at once gives the same snapshot as applying the batches
    * one at a time (batch-boundary invariance — ev13's oracle rule).
    */
  def upsert(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      versionCol: String = "version",
      opCol: String = "op"): DataFrame = {
    val dataCols = base.columns.toSeq
    require(dataCols.contains(keyCol), s"base lacks key column $keyCol")
    // batch-winner-bounded, read by the anti-join key set AND the union
    // side — one max_by collapse of the change batch instead of two
    val won = winners(changes, keyCol, dataCols, versionCol, opCol)
      .localCheckpoint()

    // untouched base rows + surviving winners. The winner key set is
    // batch-sized: AQE turns the anti-join into a broadcast and the
    // base never exchanges.
    base
      .join(won.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(won.where(col(opCol) =!= "D").select(dataCols.map(col): _*))
  }

  /** Corpus timeline — time travel over the delta log WITHOUT
    * materializing any snapshot: per checkpoint version `V`, the
    * additive statistics (row count + caller metrics, e.g. total chars
    * and a content-fingerprint sum) of the snapshot
    * `upsert(base, log WHERE version <= V)`, computed from log-sized
    * work plus ONE narrow pass over the base.
    *
    * This is the query a data-versioning layer answers constantly
    * ("how big was the corpus at release V? did content actually
    * change?") — and the naive plan (materialize every snapshot, then
    * aggregate each) re-shuffles the petabyte base once per version.
    * Here instead:
    *
    *   1. one partial+final aggregate folds the base to a single
    *      FLOOR row (version 0 of the timeline);
    *   2. each log row is replicated to the checkpoints it is visible
    *      at (`explode` over the version list — |log|·|V| rows, all
    *      log-sized), then one `max_by` picks the winner per
    *      (checkpoint, key), exactly [[winners]]' argmax so the
    *      timeline agrees with [[upsert]] at every V (spec-gated);
    *   3. the winners' keys fetch their base contribution through a
    *      broadcast semi/left join — the base side is a narrow
    *      scan→filter, zero exchange;
    *   4. per (checkpoint, key) the metric DELTA is
    *      (winner contribution, 0 if tombstoned) − (base contribution,
    *      0 if absent), summed per checkpoint and added to the floor.
    *
    * Metrics must be ADDITIVE per row (sums of long-typed columns);
    * `n_docs` (count) is always included. Fingerprint metrics should
    * stay ≤ ~40 bits per row so a 2^23-row corpus sums well inside a
    * signed 64-bit long (ANSI mode makes overflow an error, not a
    * wrap).
    *
    * Output: one row per version in `0L +: versions` with columns
    * `version, n_docs, <metric names>`.
    */
  def timeline(
      base: DataFrame,
      log: DataFrame,
      keyCol: String,
      versions: Seq[Long],
      metrics: Seq[(String, Column)],
      versionCol: String = "version",
      opCol: String = "op"): DataFrame = {
    require(versions.nonEmpty, "need at least one checkpoint version")
    val allM = ("n_docs", lit(1L)) +: metrics
    def longs(pfx: String) = allM.map { case (n, c) => c.cast("long").as(pfx + n) }

    val baseAgg = base.agg(
      sum(allM.head._2.cast("long")).as("n_docs"),
      allM.tail.map { case (n, c) => sum(c.cast("long")).as(n) }: _*)

    val win = log
      .withColumn("chk", explode(array(versions.map(lit(_)): _*)))
      .where(col(versionCol) <= col("chk"))
      .groupBy(col("chk"), col(keyCol))
      .agg(max_by(
        struct(col(opCol).as("op") +: longs(""): _*),
        struct(col(versionCol), col(opCol))).as("w"))

    // winner keys are log-sized: the semi-join broadcasts and the base
    // never exchanges; the left join below is log-sized on both sides
    val touched = win.select(col(keyCol)).distinct()
    val baseC = base.join(broadcast(touched), Seq(keyCol), "left_semi")
      .select(col(keyCol) +: longs("b_"): _*)

    val deltas = win.join(baseC, Seq(keyCol), "left")
      .select(col("chk") +: allM.map { case (n, _) =>
        (when(col("w.op") =!= "D", col(s"w.$n")).otherwise(lit(0L))
          - coalesce(col(s"b_$n"), lit(0L))).as(s"d_$n") }: _*)
      .groupBy("chk")
      .agg(sum(col("d_" + allM.head._1)).as("d_" + allM.head._1),
        allM.tail.map { case (n, _) => sum(col(s"d_$n")).as(s"d_$n") }: _*)

    val floor = baseAgg
      .select(lit(0L).as("version") +: allM.map { case (n, _) => col(n) }: _*)
    val atChk = deltas.crossJoin(broadcast(baseAgg))
      .select(col("chk").as("version") +:
        allM.map { case (n, _) => (col(n) + col(s"d_$n")).as(n) }: _*)
    floor.unionByName(atChk)
  }

  /** Corpus snapshot diff — the audit side of CDC: given two snapshot
    * versions and a content fingerprint, emit one row per CHANGED key
    * (`added` / `removed` / `modified`), nothing for unchanged keys.
    * What a data-versioning layer shows between corpus releases, and
    * the consistency check a merge pipeline runs after the fact:
    * `snapshotDiff(base, upsert(base, changes), k, fp)` must recover
    * exactly the changes that were applied (spec-gated round trip).
    *
    * Plan: project each side to (key, fp) FIRST — the full-outer join
    * shuffles two narrow columns, never document bodies — then one
    * co-partitioned join. Snapshots bucketed on the key
    * ([[graft.sources.Bucketed]]) plan the join with zero exchanges;
    * output is change-sized.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      fp: Column): DataFrame =
    oldSnap.select(col(keyCol), fp.as("old_fp"))
      .join(newSnap.select(col(keyCol), fp.as("new_fp")), Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "modified"))
      .where(col("status").isNotNull)
      .select(col(keyCol), col("status"), col("old_fp"), col("new_fp"))

  /** Log vacuum / snapshot expire — the retention side of the lake
    * trio ([[upsert]]+time travel reads, [[timeline]] stats, this):
    * given the retained checkpoint versions, a log entry is REMOVABLE
    * iff it is the winner at NO retained checkpoint — replaying the
    * vacuumed log reproduces every retained snapshot exactly
    * (spec-gated), while dropped entries only served versions nobody
    * can read any more. Entries NEWER than the newest retained
    * checkpoint are always kept (they are future state, not history).
    *
    * Winner sets are log-sized (one max per (checkpoint, key) —
    * versions are distinct per key, [[winners]]' invariant), the
    * anti-join shuffles on the key: log-sized work end to end, the
    * petabyte base is never touched.
    */
  def vacuumLog(log: DataFrame, keyCol: String, retained: Seq[Long],
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    require(retained.nonEmpty, "need at least one retained checkpoint")
    val win = log
      .withColumn("__chk", explode(array(retained.map(lit(_)): _*)))
      .where(col(versionCol) <= col("__chk"))
      .groupBy(col("__chk"), col(keyCol))
      .agg(max(col(versionCol)).as(versionCol))
      .select(col(keyCol), col(versionCol)).distinct()
    log.where(col(versionCol) <= retained.max)
      .join(win, Seq(keyCol, versionCol), "left_anti")
  }

  /** SCD-2 history build: where [[upsert]] keeps only the latest state
    * (SCD-1), this emits every version as a validity interval — the
    * dimension-table shape a lakehouse keeps for time travel per ROW
    * ([[timeline]] answers per SNAPSHOT). Base rows open at version 0;
    * each change closes the key's previous interval at its version and
    * (unless a tombstone) opens its own; the last open interval per key
    * is `is_current`. A 'D' contributes only its closing edge — it is
    * not an interval.
    *
    * One window per key ordered by version: partitions are per-key and
    * version-count-sized (CDC depth, a few rows), so the window never
    * concentrates a shuffle — the skew ceiling is the hottest key's
    * change count, not the corpus. Agrees with [[upsert]] by
    * construction: the `is_current` slice IS the SCD-1 snapshot
    * (spec-gated).
    */
  def scd2History(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      versionCol: String = "version",
      opCol: String = "op"): DataFrame = {
    val dataCols = base.columns.toSeq
    require(dataCols.contains(keyCol), s"base lacks key column $keyCol")
    val ev = base
      .withColumn(opCol, lit("I")).withColumn(versionCol, lit(0L))
      .select((dataCols :+ opCol :+ versionCol).map(col): _*)
      .unionByName(changes.select((dataCols :+ opCol :+ versionCol).map(col): _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(versionCol)
    ev
      .withColumn("valid_from", col(versionCol).cast("long"))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w).cast("long"))
      .where(col(opCol) =!= "D")
      .withColumn("is_current", col("valid_to").isNull)
      .select(dataCols.map(col) :+ col("valid_from") :+ col("valid_to") :+
        col("is_current"): _*)
  }
}
