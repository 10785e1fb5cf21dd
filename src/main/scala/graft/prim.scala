package graft

/** Primitive-specialized open-addressing hash structures for the hot encode
  * path (no boxing — the JVM analog of the reference delegating hot loops
  * to native/WASM backends).
  */

/** Int hash set, linear probing, power-of-two capacity. Not thread-safe. */
final class IntSet(initialCapacity: Int = 1 << 10) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
  private var mask = cap - 1
  private var keys = new Array[Int](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  /** Adds v; returns true if newly added. */
  def add(v: Int): Boolean = {
    if (n * 4 >= cap * 3) grow()
    var i = (phi(v)) & mask
    while (used(i)) {
      if (keys(i) == v) return false
      i = (i + 1) & mask
    }
    keys(i) = v; used(i) = true; n += 1
    true
  }

  private def phi(v: Int): Int = {
    val h = v * -1640531527 // 0x9E3779B9
    h ^ (h >>> 16)
  }

  private def grow(): Unit = {
    val ok = keys; val ou = used; val oc = cap
    cap <<= 1; mask = cap - 1
    keys = new Array[Int](cap); used = new Array[Boolean](cap); n = 0
    var i = 0
    while (i < oc) { if (ou(i)) add(ok(i)); i += 1 }
  }
}

/** Long -> Int counting map, linear probing. Zero key allowed via flag. */
final class LongIntMap(initialCapacity: Int = 1 << 10) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Int](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  def increment(k: Long): Unit = addTo(k, 1)

  def addTo(k: Long, delta: Int): Unit = {
    if (n * 4 >= cap * 3) grow()
    var i = phi(k) & mask
    while (used(i)) {
      if (keys(i) == k) { vals(i) += delta; return }
      i = (i + 1) & mask
    }
    keys(i) = k; vals(i) = delta; used(i) = true; n += 1
  }

  def get(k: Long, default: Int): Int = {
    var i = phi(k) & mask
    while (used(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    default
  }

  /** Iterate entries into parallel arrays (for sorting/selection). */
  def entries: (Array[Long], Array[Int]) = {
    val ks = new Array[Long](n)
    val vs = new Array[Int](n)
    var i = 0; var o = 0
    while (i < cap) {
      if (used(i)) { ks(o) = keys(i); vs(o) = vals(i); o += 1 }
      i += 1
    }
    (ks, vs)
  }

  private def phi(k: Long): Int = {
    val h = k * -7046029254386353131L // 0x9E3779B97F4A7C15
    ((h ^ (h >>> 32)).toInt)
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used; val oc = cap
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap); vals = new Array[Int](cap)
    used = new Array[Boolean](cap); n = 0
    var i = 0
    while (i < oc) { if (ou(i)) addTo(ok(i), ov(i)); i += 1 }
  }
}
