package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
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

  case class DecodedFeature(doc_id: Long, n_bytes: Int, checksum: Long, feature: Array[Float])

  /** Batched decode kernel: the Scala analog of a pandas-UDF
    * `mapInPandas` — one invocation per PARTITION, iterating records, so
    * per-batch setup (codec init, model load) is amortized exactly as a
    * real media decoder needs. The decode itself is a STUB (deterministic
    * checksum + fake 8-dim feature from the payload bytes); the
    * iterator-in/iterator-out shape, schema, and partition amortization
    * are the real plumbing.
    */
  def decodeBatch(df: DataFrame, idCol: String, binCol: String = "payload"): Dataset[DecodedFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition setup would init the codec here, once
        batch.map { case (id, bytes) =>
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
          val feat = Array.tabulate(8)(j => ((sum >>> (j * 8)) & 0xff).toFloat / 255f)
          DecodedFeature(id, bytes.length, sum, feat)
        }
      }
  }
}
