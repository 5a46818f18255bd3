package graft.codecs

/** Minimal open-addressing Long -> Int hash map (linear probing, no
  * boxing) for the FSST symbol lookup hot path. Not thread-safe; sized
  * once for ≤255 entries so probes stay short.
  */
final class LongIntMap(capacityPow2: Int = 1024) {
  private val mask = capacityPow2 - 1
  private val keys = new Array[Long](capacityPow2)
  private val vals = new Array[Int](capacityPow2)
  private val used = new Array[Boolean](capacityPow2)

  @inline private def slot(k: Long): Int = {
    var h = k * 0x9e3779b97f4a7c15L
    h ^= h >>> 32
    (h.toInt & mask)
  }

  def put(k: Long, v: Int): Unit = {
    var i = slot(k)
    while (used(i) && keys(i) != k) i = (i + 1) & mask
    keys(i) = k
    vals(i) = v
    used(i) = true
  }

  /** @return value or -1 when absent. */
  def get(k: Long): Int = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    -1
  }
}
