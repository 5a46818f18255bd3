package graft.codecs

/** Order-preserving bijection between doubles and signed longs — the
  * storage transform behind column kind 5 (DOUBLE). Mapped values sort
  * (as signed longs) exactly like `java.lang.Double.compare` sorts the
  * doubles: negatives below positives, -0.0 < 0.0, NaN above +Infinity.
  * That single property is what lets DOUBLE columns ride the ENTIRE
  * kind-0 long machinery unchanged — stats-selected codecs, zone maps,
  * comparison pushdown, manifest-answered MIN/MAX — with only a bit
  * flip at the column boundary.
  *
  * The mapping is the public Lucene `NumericUtils.doubleToSortableLong`
  * shape: flip the low 63 bits of negative IEEE-754 values so their
  * two's-complement order reverses into numeric order. `doubleToLongBits`
  * canonicalizes NaN (all NaN payloads collapse to the canonical quiet
  * NaN) — documented: NaN round-trips as NaN, payload bits are not
  * preserved.
  */
object DoubleBits {

  @inline def toSortableLong(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  @inline def fromSortableLong(l: Long): Double =
    java.lang.Double.longBitsToDouble(l ^ ((l >> 63) & 0x7fffffffffffffffL))

  def toDoubles(mapped: Array[Long]): Array[Double] = {
    val out = new Array[Double](mapped.length)
    var i = 0
    while (i < mapped.length) { out(i) = fromSortableLong(mapped(i)); i += 1 }
    out
  }
}
