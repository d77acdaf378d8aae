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
  * is a dim table, and what crosses the wire is ≤ min(|keys|·k, m)
  * distinct bit positions, each a long). The filter ships to
  * executors as a bit-packed long-array plan literal (m/8 bytes), and
  * the probe is a pure codegen'd column predicate — the big side is
  * pruned DURING ITS SCAN, before any exchange, so rows that cannot
  * join never enter a shuffle. False positives are removed by the
  * exact join the caller runs after (result = exact semi-join; the
  * Bloom pass only changes WHERE rows die, not which).
  *
  * SIZING IS THE SCALE LEVER: a fixed m saturates once n ≈ m (fpp→1,
  * the filter prunes nothing — measured at the 10× rehearsal: 300k
  * build keys in a 2¹⁶-bit filter left the probe a no-op). Default is
  * therefore AUTO: one count() of the dim side, then m = 16n rounded
  * up to a power of two (k=3 → fpp ≈ (1−e^(−3/16))³ ≈ 0.5%), capped
  * at 2²⁷ bits = 16 MB of filter — past that, n is no longer
  * "dim-sized" and a Bloom build belongs in a distributed aggregate,
  * not a driver literal. */
object BloomJoin {

  /** Build and probe must hash IDENTICAL inputs: the build side folds
    * keys as longs, so a probe on the key's native column type (e.g.
    * IntegerType, which xxhash64 hashes via hashInt) lands on
    * different bit positions and silently drops matching rows. Both
    * sides therefore cast to long — sound only for keys where that
    * cast is injective-or-consistent, i.e. numeric types (a fractional
    * key truncates identically on both sides: false positives only,
    * removed by the exact join). Non-numeric keys (strings) would cast
    * to NULL and produce false NEGATIVES, so they are refused. */
  private def requireNumericKey(df: DataFrame, key: Column, side: String): Unit = {
    val dt = df.select(key).schema.head.dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"Bloom $side key must be numeric (got $dt): a non-numeric key casts " +
        "to NULL as long and the pre-filter would drop genuinely matching rows")
  }

  /** Keep only `big` rows whose `bigKey` might be in `small`'s
    * `smallKey` set (no false negatives). `bits` = 0 → auto-size from
    * the build-side distinct count. */
  def bloomFilter(big: DataFrame, bigKey: Column,
                  small: DataFrame, smallKey: Column,
                  bits: Int = 0, k: Int = 3): DataFrame = {
    requireNumericKey(small, smallKey, "build")
    requireNumericKey(big, bigKey, "probe")
    // null keys never equi-join; dropping them here also keeps the
    // position collect NPE-free
    val keys = small.select(smallKey.cast("long").as("k"))
      .where(col("k").isNotNull).distinct()
    val m: Long =
      if (bits > 0) { require(Integer.bitCount(bits) == 1, "bits must be a power of two"); bits.toLong }
      else {
        val n = keys.count()
        math.min(1L << 27, math.max(1L << 16,
          java.lang.Long.highestOneBit(math.max(1L, 16 * n - 1)) << 1))
      }
    val positions = keys.select(explode(array(
        (0 until k).map(i => pmod(xxhash64(col("k"), lit(i)), lit(m))): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long]((m / 64).toInt)
    positions.foreach(p => words((p / 64).toInt) |= (1L << (p % 64)))
    val f = typedlit(words.toSeq)
    val probe = (0 until k).map { i =>
      // cast to long: hash EXACTLY what the build side hashed
      val p = pmod(xxhash64(bigKey.cast("long"), lit(i)), lit(m))
      val word = element_at(f, (p / 64).cast("int") + 1)
      val bit = pmod(p, lit(64L)).cast("int")
      call_function("shiftright", word, bit).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
    big.where(probe)
  }

  /** Exact semi-join with the Bloom pre-filter applied at the probe
    * scan: bloom prune → broadcast left-semi join (removes the false
    * positives). Result rows are exactly `big ⋉ small`. */
  def semiJoin(big: DataFrame, bigKeyName: String,
               small: DataFrame, smallKeyName: String,
               bits: Int = 0, k: Int = 3): DataFrame = {
    val keys = small.select(col(smallKeyName)).distinct()
    bloomFilter(big, col(bigKeyName), small, col(smallKeyName), bits, k)
      .join(broadcast(keys), col(bigKeyName) === keys(smallKeyName), "left_semi")
  }

  /** DISTRIBUTED Bloom build — the shape past the 2²⁷-bit driver-
    * literal cap above: each partition ORs its keys into a local
    * bit array, partials merge up Spark's aggregation tree (one
    * `Aggregator`, no distinct, no per-position collect — what
    * reaches the driver is exactly one merged m-bit array regardless
    * of build-side row count), and the finished filter broadcasts
    * back for the same codegen'd probe predicate. At 100 TB this is
    * the only Bloom build that works: the build side never leaves
    * the executors, and driver traffic is m/8 bytes × #partitions in
    * a tree, not n keys.
    *
    * The filter is bit-identical to `bloomFilter`'s for the same
    * (m, k): OR is commutative/associative, so partition order
    * cannot change the result — probe answers are deterministic. */
  def distributedFilterBits(small: DataFrame, smallKey: Column,
                            m: Long, k: Int): Array[Long] = {
    require(java.lang.Long.bitCount(m) == 1, "m must be a power of two")
    val words = (m / 64).toInt
    val agg = new org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
      def zero: Array[Long] = new Array[Long](words)
      def reduce(b: Array[Long], key: Long): Array[Long] = {
        var i = 0
        while (i < k) {
          // EXACTLY the column probe's `xxhash64(key, lit(i))`:
          // seed 42, children folded left-to-right (long, then int)
          val h1 = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(key, 42L)
          val h2 = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashInt(i, h1)
          val p = java.lang.Math.floorMod(h2, m)
          b((p / 64).toInt) |= (1L << (p % 64))
          i += 1
        }
        b
      }
      def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
        var i = 0; while (i < words) { a(i) |= c(i); i += 1 }; a
      }
      def finish(b: Array[Long]): Array[Long] = b
      def bufferEncoder = org.apache.spark.sql.Encoders.javaSerialization[Array[Long]]
      def outputEncoder = org.apache.spark.sql.Encoders.javaSerialization[Array[Long]]
    }
    import small.sparkSession.implicits._
    // null build keys never equi-join; un-dropped they would NPE in
    // the non-nullable Long decode below
    small.select(smallKey.cast("long").as("k")).na.drop().as[Long]
      .select(agg.toColumn).head()
  }

  /** Exact semi-join via the distributed Bloom build: same result,
    * same probe, different build path (tree-merged partials instead
    * of a driver-assembled position list). */
  def semiJoinDistributed(big: DataFrame, bigKeyName: String,
                          small: DataFrame, smallKeyName: String,
                          bits: Long, k: Int = 3): DataFrame = {
    requireNumericKey(small, col(smallKeyName), "build")
    requireNumericKey(big, col(bigKeyName), "probe")
    val words = distributedFilterBits(small, col(smallKeyName), bits, k)
    val f = typedlit(words.toSeq)
    val m = bits
    val probe = (0 until k).map { i =>
      // cast to long: the build side folded keys via XXH64.hashLong
      val p = pmod(xxhash64(col(bigKeyName).cast("long"), lit(i)), lit(m))
      val word = element_at(f, (p / 64).cast("int") + 1)
      val bit = pmod(p, lit(64L)).cast("int")
      call_function("shiftright", word, bit).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
    val keys = small.select(col(smallKeyName)).distinct()
    big.where(probe)
      .join(broadcast(keys), col(bigKeyName) === keys(smallKeyName), "left_semi")
  }
}
