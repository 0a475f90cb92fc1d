package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join splitting handles
  * most cases at runtime; salting is the static fallback when one key
  * dominates so heavily that even split partitions hot-spot (genomic
  * coverage pileups, celebrity users, null-ish defaults).
  *
  * Left (large, skewed) rows get a deterministic salt in [0, factor);
  * right (smaller) rows are replicated across all salts. The join key
  * becomes (key, salt) — the hot key's rows spread over `factor`
  * reducers. Replication multiplies the right side by `factor`: size it
  * so (right × factor) still fits the shuffle budget, or broadcast
  * instead when the right side is small enough (then salting is moot).
  */
object SkewJoin {

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      factor: Int = 8): DataFrame = {
    require(factor >= 1)
    // deterministic spread: hash the whole left row modulo factor
    val saltedLeft = left.withColumn(
      "__salt", pmod(xxhash64(struct(left.columns.map(col): _*)), lit(factor)))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(factor - 1L))))
    saltedLeft
      .join(saltedRight, saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }
}
