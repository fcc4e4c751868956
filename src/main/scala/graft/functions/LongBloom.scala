package graft.functions

import org.apache.spark.sql.Dataset

/** Minimal Bloom filter over 64-bit keys with FULL 64-bit double
  * hashing. Exists because the stock DataFrame `stat.bloomFilter`
  * derives its k probe positions from two 32-bit base hashes; on
  * KB-scale filters that scheme's observed false-positive rate floors
  * around 1e-4 regardless of the requested fpp (measured: 3 FPs in
  * 26.5k probes at fpp 1e-8 on the sf0.001 gram table). Mixing the key
  * through splitmix64 twice gives two independent 64-bit base hashes,
  * and the classic `h1 + i*h2` probe sequence then achieves the
  * textbook rate — the difference between "mostly right" and an
  * assertable contract.
  *
  * Scale notes: the bit array is `-n ln(fpp)/ln(2)^2` bits (~48 bits
  * per key at 1e-10 — a 1e9-key benchmark set is ~6 GB, a 1e6-key one
  * ~6 MB, broadcast-friendly either way), built DISTRIBUTED by
  * per-partition bit-array fills OR-merged with `treeAggregate` (one
  * of the few justified RDD drops: imperative bit twiddling per
  * partition). Insertion is commutative and associative, so the built
  * array is independent of partitioning — deterministic for a given
  * (keys, numBits, k).
  */
final class LongBloom private[functions] (val bits: Array[Long], val k: Int)
    extends Serializable {

  private def numBits: Long = bits.length.toLong * 64L

  def mightContain(key: Long): Boolean = {
    val h1 = LongBloom.mix(key)
    val h2 = LongBloom.mix(h1)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

object LongBloom {

  /** splitmix64 finalizer — a full-avalanche 64-bit mix. */
  private[functions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def fill(bits: Array[Long], k: Int, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1)
    val m = bits.length.toLong * 64L
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63))
      i += 1
    }
  }

  /** Build over a Dataset of keys: textbook sizing from (n, fpp), then
    * a distributed fill — each partition populates its own array, OR-
    * merged up a tree. Nothing but the (broadcast-sized) arrays moves.
    */
  def build(keys: Dataset[Long], expectedItems: Long, fpp: Double): LongBloom = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val nBits0 = math.ceil(
      -expectedItems.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val words = math.max(1L, (nBits0 + 63L) / 64L).toInt
    val k = math.max(1,
      math.round(nBits0.toDouble / expectedItems * math.log(2)).toInt)
    val bits = keys.rdd.treeAggregate(new Array[Long](words))(
      (b, h) => { fill(b, k, h); b },
      (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
    new LongBloom(bits, k)
  }
}
