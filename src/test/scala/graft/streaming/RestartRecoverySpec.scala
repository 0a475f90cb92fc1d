package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash-recovery evidence (VERDICT r12 #4): every other streaming spec
  * runs `processAllAvailable()` inside ONE query instance, so nothing on
  * record proved that checkpointed `flatMapGroupsWithState` state
  * survives a DRIVER LOSS — the failure mode a 100 TB ingest actually
  * hits. These suites stop a stateful query mid-stream (after the first
  * half of a time-split fixture), build a BRAND-NEW query instance on
  * the same checkpoint, feed the remaining files, and assert the
  * concatenated exactly-once file-sink output equals an uninterrupted
  * single run — for both cross-batch state carriers: ev4's open
  * sessions and ev23's per-source consumed-token budget.
  *
  * The sink is the parquet file sink (not memory): its _spark_metadata
  * commit log is the exactly-once contract that survives the restart,
  * and `spark.read.parquet` honors it, so a half-written phase-1 batch
  * could never leak into the comparison.
  */
class RestartRecoverySpec extends SparkSpec {

  /** Write `df` as `parts` single-file parquets ordered by `sortCol`
    * across files, into `staging`, with strictly increasing mtimes (the
    * file source's oldest-first arrival order). Returns the file paths
    * in order.
    */
  private def stageFiles(df: DataFrame, parts: Int, sortCol: String,
      staging: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val rows = df.orderBy(col(sortCol)).collect()
    val per = math.max(1, math.ceil(rows.length.toDouble / parts).toInt)
    rows.grouped(per).zipWithIndex.map { case (chunk, i) =>
      val part = spark.createDataFrame(
        java.util.Arrays.asList(chunk: _*), df.schema)
      val tmp = java.nio.file.Files.createTempDirectory(s"stage$i").resolve("out")
      part.coalesce(1).write.parquet(tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
      val dest = staging.resolve(f"f$i%02d.parquet")
      java.nio.file.Files.move(f.toPath, dest)
      assert(dest.toFile.setLastModified(1700000000000L + i * 60000L))
      dest
    }.toSeq
  }

  private def copyIn(files: Seq[java.nio.file.Path], live: java.nio.file.Path): Unit =
    files.foreach { f =>
      val dest = live.resolve(f.getFileName)
      java.nio.file.Files.copy(f, dest)
      assert(dest.toFile.setLastModified(f.toFile.lastModified()))
    }

  /** Run one query LIFETIME: build the stream from scratch (a restart
    * is a new plan, not a resumed object), process everything currently
    * in the source dir, stop. Returns rows emitted to the sink so far.
    */
  private def runLifetime(mk: () => DataFrame, ckpt: String, out: String): Long = {
    val q = mk().writeStream
      .outputMode("append")
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .start(out)
    q.processAllAvailable()
    q.stop()
    try spark.read.parquet(out).count()
    catch { case _: org.apache.spark.sql.AnalysisException => 0L }
  }

  private def tmpdir(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(tag)

  test("sessionization: open-session state survives a stop + restart from checkpoint") {
    val events = StreamingOps.readEventsBatch(spark, s"${sf("0.001")}/events.parquet")
    val staging = tmpdir("rr_stage")
    val files = stageFiles(events, parts = 6, sortCol = "ts", staging)

    // uninterrupted reference: all files visible from the start, same
    // one-file-per-trigger batch cadence
    val refSrc = tmpdir("rr_ref_src"); copyIn(files, refSrc)
    val refOut = tmpdir("rr_ref_out").toString
    runLifetime(
      () => StreamingOps.sessionizeStream(
        StreamingOps.readEvents(spark, s"$refSrc/*.parquet", Some(1))).toDF(),
      tmpdir("rr_ref_ck").toString, refOut)

    // crashed run: 3 files, stop, NEW query on the same checkpoint, 3 more
    val liveSrc = tmpdir("rr_live_src"); copyIn(files.take(3), liveSrc)
    val ckpt = tmpdir("rr_live_ck").toString
    val liveOut = tmpdir("rr_live_out").toString
    def mk() = StreamingOps.sessionizeStream(
      StreamingOps.readEvents(spark, s"$liveSrc/*.parquet", Some(1))).toDF()
    val phase1 = runLifetime(mk _, ckpt, liveOut)
    copyIn(files.drop(3), liveSrc)
    val total = runLifetime(mk _, ckpt, liveOut)

    val got = spark.read.parquet(liveOut)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = spark.read.parquet(refOut)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet === want.toSet,
      "restarted run must emit exactly the uninterrupted run's sessions")
    assert(got.length === got.toSet.size,
      "exactly-once: the restart must not re-emit phase-1 sessions")
    assert(want.nonEmpty && total > phase1,
      s"fixture must emit on both sides of the crash (phase1=$phase1, total=$total)")

    // the state-recovery smoking gun: at least one emitted session must
    // SPAN the crash boundary — its open state was built before the stop
    // and closed by events (or watermark) after the restart
    val boundaryTs = spark.read.parquet(files.take(3).map(_.toString): _*)
      .agg(max(col("ts"))).head().getLong(0)
    assert(got.exists { case (_, s, e, _) => s <= boundaryTs && e > boundaryTs },
      s"no session spans the crash boundary ($boundaryTs) — state recovery unexercised")
  }

  test("budget admission: per-source consumed-token state survives a restart") {
    val docs = spark.read.parquet(s"${sf("0.001")}/documents.parquet")
    val staging = tmpdir("rr_bstage")
    val files = stageFiles(docs, parts = 6, sortCol = "doc_id", staging)
    val budget = 800L

    val refSrc = tmpdir("rr_bref_src"); copyIn(files, refSrc)
    val refOut = tmpdir("rr_bref_out").toString
    runLifetime(
      () => StreamingOps.budgetFillStream(
        StreamingOps.readDocuments(spark, s"$refSrc/*.parquet", Some(1)), budget).toDF(),
      tmpdir("rr_bref_ck").toString, refOut)

    val liveSrc = tmpdir("rr_blive_src"); copyIn(files.take(3), liveSrc)
    val ckpt = tmpdir("rr_blive_ck").toString
    val liveOut = tmpdir("rr_blive_out").toString
    def mk() = StreamingOps.budgetFillStream(
      StreamingOps.readDocuments(spark, s"$liveSrc/*.parquet", Some(1)), budget).toDF()
    val phase1 = runLifetime(mk _, ckpt, liveOut)
    copyIn(files.drop(3), liveSrc)
    val total = runLifetime(mk _, ckpt, liveOut)

    def slurp(p: String) = spark.read.parquet(p)
      .select("source", "doc_id", "n_tokens", "start_offset")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = slurp(liveOut)
    val want = slurp(refOut)
    // start_offset is the carried consumed-token state itself: a lost
    // state store would restart it at 0 after the crash and admit past
    // the budget — value equality here IS the recovery proof
    assert(got.toSet === want.toSet,
      "restarted admissions (incl. carried start_offset) must equal the single run")
    assert(got.length === got.toSet.size, "exactly-once: no re-admissions")
    assert(want.nonEmpty && total > phase1,
      s"fixture must admit on both sides of the crash (phase1=$phase1, total=$total)")
    val splitId = spark.read.parquet(files.take(3).map(_.toString): _*)
      .agg(max(col("doc_id"))).head().getLong(0)
    assert(got.exists(_._2 <= splitId) && got.exists(_._2 > splitId),
      "admissions must land on both sides of the crash boundary")
  }

  test("state-store shard count follows the session's sized shuffle partitions and is pinned in the checkpoint") {
    // The Tuning partition rule reaches streaming state through
    // spark.sql.shuffle.partitions at FIRST query start: the state
    // store shards once, then the checkpoint pins that count for the
    // query's lifetime (restarts under a differently-sized session keep
    // the original layout). Entry points set the sized value on the
    // session before any stream starts, so this is the wiring proof.
    val s2 = spark.newSession() // isolated SQLConf, shared context
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    import s2.implicits._
    val src = java.nio.file.Files.createTempDirectory("sized_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sized_ckpt").toString + "/ckpt"
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
      .write.mode("overwrite").parquet(src)
    val q = s2.readStream.schema("id LONG, k STRING").parquet(src)
      .groupBy("k").count()
      .writeStream.outputMode("complete").format("noop")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable(); q.stop()
    // numeric dirs are the shards; state/0 also holds _metadata
    val shards = Option(new java.io.File(s"$ckpt/state/0").listFiles())
      .map(_.count(f => f.isDirectory && f.getName.forall(_.isDigit))).getOrElse(-1)
    assert(shards === 7,
      s"state store must shard at the session's sized partition count, got $shards")
    val offsets = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$ckpt/offsets/0")), "UTF-8")
    assert(offsets.contains("\"spark.sql.shuffle.partitions\":\"7\""),
      s"checkpoint offset log must pin the sized partition count:\n$offsets")
  }
}
