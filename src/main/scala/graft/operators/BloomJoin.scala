package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom-filter pre-filter for semi-joins — the manual
  * version of the runtime row-level filtering Spark injects under
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` (SPARK-32268),
  * exposed as an operator so the pruning applies deterministically
  * and composes with any downstream plan.
  *
  * The build side's distinct keys are hashed k ways into an m-bit
  * filter assembled ON THE DRIVER (a bounded collect: the build side
  * is a dim table, and what crosses the wire is ≤ |keys|·k distinct
  * bit positions, each a long). The filter ships to executors as a
  * plan literal (m bits ≈ 8 KB at the default 2¹⁶), and the probe is
  * a pure codegen'd column predicate — the big side is pruned DURING
  * ITS SCAN, before any exchange, so rows that cannot join never
  * enter a shuffle. False positives are removed by the exact join the
  * caller runs after (result = exact semi-join; the Bloom pass only
  * changes WHERE rows die, not which).
  *
  * At 100 TB: the big side streams through scan+filter untouched by
  * shuffle; the only coordination is the dim-side distinct (tiny) and
  * one broadcast. With fpp ≈ (1-e^(-kn/m))^k — n=10⁴ keys, m=2¹⁶,
  * k=3 gives ~2.7% — the exchange downstream sees ~FP·|big| extra
  * rows, not |big|. */
object BloomJoin {

  /** Keep only `big` rows whose `bigKey` might be in `small`'s
    * `smallKey` set (no false negatives). */
  def bloomFilter(big: DataFrame, bigKey: Column,
                  small: DataFrame, smallKey: Column,
                  bits: Int = 1 << 16, k: Int = 3): DataFrame = {
    require(Integer.bitCount(bits) == 1, "bits must be a power of two")
    val m = bits.toLong
    val keys = small.select(smallKey.cast("long").as("k")).distinct()
    val positions = keys.select(explode(array(
        (0 until k).map(i => pmod(xxhash64(col("k"), lit(i)), lit(m))): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val filter = new Array[Boolean](bits)
    positions.foreach(p => filter(p.toInt) = true)
    val f = typedlit(filter.toSeq)
    val probe = (0 until k).map { i =>
      element_at(f, (pmod(xxhash64(bigKey, lit(i)), lit(m)) + 1).cast("int"))
    }.reduce(_ && _)
    big.where(probe)
  }

  /** Exact semi-join with the Bloom pre-filter applied at the probe
    * scan: bloom prune → broadcast left-semi join (removes the false
    * positives). Result rows are exactly `big ⋉ small`. */
  def semiJoin(big: DataFrame, bigKeyName: String,
               small: DataFrame, smallKeyName: String,
               bits: Int = 1 << 16, k: Int = 3): DataFrame = {
    val keys = small.select(col(smallKeyName)).distinct()
    bloomFilter(big, col(bigKeyName), small, col(smallKeyName), bits, k)
      .join(broadcast(keys), col(bigKeyName) === keys(smallKeyName), "left_semi")
  }
}
