package graft.codecs

/** Order-preserving bijection between floats and signed ints — the
  * storage transform behind column kind 10 (FLOAT): [[DoubleBits]]'
  * mapping at half width, through the kind-2 NARROW path instead of the
  * kind-0 long path (4 raw bytes/row, zigzag-varint or downstream
  * narrow codecs). Mapped values sort (as signed ints) exactly like
  * `java.lang.Float.compare` sorts the floats: negatives below
  * positives, -0.0f < 0.0f, NaN above +Infinity — so zone maps,
  * comparison pushdown (via filter-constant pre-translation), and
  * manifest-answered MIN/MAX ride the existing int machinery unchanged.
  *
  * The public Lucene `NumericUtils.floatToSortableInt` shape;
  * `floatToIntBits` canonicalizes NaN (payloads collapse to the
  * canonical quiet NaN — documented, exactly like kind 5), which is
  * also what makes stored NaNs a single point at the top of the order.
  */
object FloatBits {

  @inline def toSortableInt(f: Float): Int = {
    val b = java.lang.Float.floatToIntBits(f)
    b ^ ((b >> 31) & 0x7fffffff)
  }

  @inline def fromSortableInt(i: Int): Float =
    java.lang.Float.intBitsToFloat(i ^ ((i >> 31) & 0x7fffffff))
}
