package graft.operators

/** Minimal open-addressing long→long hash map for executor-task kernels
  * (union-find roots): linear probing over two flat long arrays at load
  * factor ≤ 0.5, so memory is ~32 bytes per live key with ZERO per-entry
  * object headers or boxing — the reason this exists instead of
  * `mutable.HashMap[Long, Long]` (50-100 B/entry boxed, enough to OOM a
  * task right at the dedup small-graph dispatch threshold).
  *
  * `Long.MinValue` marks an empty slot; that one key value is carried in
  * dedicated fields so the full long domain is storable. Not thread-safe;
  * single-task use only.
  */
private[operators] final class LongLongMap(initialCapacity: Int)
    extends Serializable {
  private[this] var cap =
    math.max(16, java.lang.Integer.highestOneBit(math.max(1, initialCapacity - 1)) << 1)
  private[this] var keys = new Array[Long](cap)
  private[this] var vals = new Array[Long](cap)
  private[this] var live = 0
  private[this] var hasMin = false
  private[this] var minVal = 0L
  java.util.Arrays.fill(keys, Long.MinValue)

  def size: Int = live + (if (hasMin) 1 else 0)

  // splitmix64 finalizer — full-avalanche so sequential ids don't cluster
  private[this] def slot(k: Long): Int = {
    var h = k
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    (h ^ (h >>> 31)).toInt & (cap - 1)
  }

  def contains(k: Long): Boolean =
    if (k == Long.MinValue) hasMin
    else {
      var i = slot(k)
      while (keys(i) != Long.MinValue) {
        if (keys(i) == k) return true
        i = (i + 1) & (cap - 1)
      }
      false
    }

  def getOrElse(k: Long, default: Long): Long =
    if (k == Long.MinValue) { if (hasMin) minVal else default }
    else {
      var i = slot(k)
      while (keys(i) != Long.MinValue) {
        if (keys(i) == k) return vals(i)
        i = (i + 1) & (cap - 1)
      }
      default
    }

  def put(k: Long, v: Long): Unit =
    if (k == Long.MinValue) { hasMin = true; minVal = v }
    else {
      if ((live + 1) * 2 > cap) grow()
      var i = slot(k)
      while (keys(i) != Long.MinValue && keys(i) != k) i = (i + 1) & (cap - 1)
      if (keys(i) == Long.MinValue) { keys(i) = k; live += 1 }
      vals(i) = v
    }

  def foreachKey(f: Long => Unit): Unit = {
    if (hasMin) f(Long.MinValue)
    var i = 0
    while (i < cap) {
      if (keys(i) != Long.MinValue) f(keys(i))
      i += 1
    }
  }

  private[this] def grow(): Unit = {
    val oldKeys = keys
    val oldVals = vals
    cap <<= 1
    keys = new Array[Long](cap)
    vals = new Array[Long](cap)
    java.util.Arrays.fill(keys, Long.MinValue)
    live = 0
    var i = 0
    while (i < oldKeys.length) {
      if (oldKeys(i) != Long.MinValue) {
        // re-insert without the growth check — load is ≤ 0.25 post-double
        var j = slot(oldKeys(i))
        while (keys(j) != Long.MinValue) j = (j + 1) & (cap - 1)
        keys(j) = oldKeys(i)
        vals(j) = oldVals(i)
        live += 1
      }
      i += 1
    }
  }
}
