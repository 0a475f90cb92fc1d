package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned equi-join — the runtime-filter pattern made explicit:
  * a size-bounded Bloom sketch of the build side's keys (built by a
  * distributed treeAggregate, ~1.2 bytes/key at 1% fpp) is broadcast
  * and applied to the probe side BEFORE its shuffle, so a
  * sort-merge-join exchange carries only rows that can match. False
  * positives only admit rows the join itself then discards, so the
  * result IS the plain join — the sketch changes the exchange volume,
  * never the answer.
  *
  * When the build side is small enough to broadcast-hash-join, Catalyst
  * already avoids the probe-side shuffle and the sketch is redundant;
  * the win is the middle regime — a build side of millions of keys
  * (too big for a hash-table broadcast, trivially small as a bitset)
  * against a probe side of billions, where a selective build prunes
  * most of the probe exchange.
  */
object BloomJoin {

  /** Inner equi-join of `big` (probe) with `small` (build) on long
    * keys, probe side pre-filtered by the build-side Bloom sketch.
    * Join output columns = both sides' (caller projects).
    */
  def bloomPrunedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      fpp: Double = 0.01): DataFrame = {
    // one count job sizes the sketch; the build side is by contract the
    // small(er) relation, and stat.bloomFilter NPEs on an empty frame
    val nKeys = small.count()
    if (nKeys == 0L)
      return big.join(small, big(bigKey) === small(smallKey))
    val bf = small.stat.bloomFilter(smallKey, nKeys, fpp)
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bcast.value.mightContainLong(k))
    big.where(col(bigKey).isNotNull && might(col(bigKey)))
      .join(small, big(bigKey) === small(smallKey))
  }
}
