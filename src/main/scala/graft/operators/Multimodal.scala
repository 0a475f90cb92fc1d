package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media carried as opaque `binary` columns
  * with typed metadata alongside. The Spark-side shape — schema, batch
  * iteration, per-frame explosion, partition sizing — is real; the media
  * decode itself is a STUB (this container ships no image/audio codecs):
  * `extractMeta` derives deterministic fake dimensions from payload
  * length where a real deployment would decode headers inside the same
  * kernel.
  */
object Multimodal {

  /** Attach a binary payload column (here: the UTF-8 bytes of a text
    * column stand in for media bytes).
    */
  def attachBinary(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, col(srcCol).cast("binary"))

  /** STUB decode: metadata from payload bytes. A real codec would parse
    * the container header here — same signature, same narrow plan.
    */
  def extractMeta(df: DataFrame, binCol: String = "payload"): DataFrame = {
    val n = length(col(binCol))
    df.withColumn("n_bytes", n)
      .withColumn("width", pmod(n, lit(640)))
      .withColumn("height", pmod(n, lit(480)))
      .withColumn("n_frames", pmod(n, lit(16)))
  }

  /** Frame sampling: one output row per sampled frame index — the
    * explode-shaped plumbing a video pipeline needs (decode would happen
    * per emitted row in the same narrow stage).
    */
  def sampleFrames(df: DataFrame, everyNth: Int = 4): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(everyNth))))
}
