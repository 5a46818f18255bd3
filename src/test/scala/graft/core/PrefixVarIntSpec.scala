package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Port of the reference's test pyramid (reference: src/tests.rs,
  * tests/fuzz.rs) — boundary-exhaustive round-trips, golden bytes,
  * randomized streams, error paths, and constant invariants.
  */
class PrefixVarIntSpec extends AnyFunSuite {
  import PrefixVarInt._

  // Bounds per encoded length, derived from MaxValue itself as the
  // reference derives them (reference: src/tests.rs:9-32).
  private def boundsFor(n: Int): (Long, Long) = {
    val min = if (n == 1) 0L else MaxValue(n - 1) + 1L
    (min, MaxValue(n))
  }

  private def roundTrip(raw: Long): Unit = {
    val bytes = toBytes(raw)
    assert(bytes.length === len(raw))
    val (v, consumed) = decodePair(bytes)
    assert(v === raw, s"raw=$raw")
    assert(consumed === bytes.length)
    // value-only (codegen) form agrees with the tuple form everywhere
    assert(decodeValue(bytes, 0) === raw)
  }

  test("MaxValue table matches reference constants (src/lib.rs:52-63)") {
    assert(MaxValue.drop(1).toSeq === Seq(0x7fL, 0x3fffL, 0x1fffffL,
      0xfffffffL, 0x7ffffffffL, 0x3ffffffffffL, 0x1ffffffffffffL,
      0xffffffffffffffL, -1L))
  }

  test("boundary coding: every (length, min, max) round-trips at exact length (src/tests.rs:47-62)") {
    for (n <- 1 to 9) {
      val (min, max) = boundsFor(n)
      for (v <- Seq(min, max)) {
        assert(len(v) === n, f"len(0x$v%x)")
        roundTrip(v)
      }
      // also one interior value per class
      if (java.lang.Long.compareUnsigned(min, max) < 0) {
        val mid = min + ((max - min) >>> 1)
        assert(len(mid) === n)
        roundTrip(mid)
      }
    }
  }

  test("signed: -1 encodes to 1 byte via zigzag (src/tests.rs:64-71)") {
    assert(zigzagEncode(-1L) === 1L)
    assert(len(zigzagEncode(-1L)) === 1)
    for (v <- Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L, -64L, 63L, -65L, 64L))
      assert(zigzagDecode(zigzagEncode(v)) === v)
    // small magnitudes encode short regardless of sign
    assert(len(zigzagEncode(-64L)) === 1)
    assert(len(zigzagEncode(-65L)) === 2)
  }

  test("golden bytes: 167894 encodes to 3 bytes (reference doc src/lib.rs:22)") {
    val b = toBytes(167894L)
    assert(b.length === 3)
    // 167894 = 0x28FD6; 3-byte word 0x028FD6 | tag 0xC00000 = 0xC28FD6
    assert(b.toSeq.map(_ & 0xff) === Seq(0xc2, 0x8f, 0xd6))
  }

  test("golden bytes: [1, 2, -30, -24000] as signed encode to 6 bytes total (src/tests.rs:204-211)") {
    val w = new BlockWriter()
    Seq(1L, 2L, -30L, -24000L).foreach(w.putSignedVarint)
    assert(w.size === 6)
    val r = new BlockReader(w.result())
    assert(Seq.fill(4)(r.getSignedVarint()) === Seq(1L, 2L, -30L, -24000L))
    assert(!r.hasRemaining)
  }

  test("golden bytes: fuzz regression [0xf0,0xaf,0x3b,0x2b,0x00] decodes to 2939890432 consuming 5 bytes (tests/fuzz.rs:6-9)") {
    val buf = Array(0xf0, 0xaf, 0x3b, 0x2b, 0x00).map(_.toByte)
    val (v, n) = decodePair(buf)
    assert(v === 2939890432L)
    assert(n === 5)
    assert(checkU32(v) === v) // fits u32
  }

  test("max u64 encodes as 0xFF + 8 raw BE bytes (src/raw.rs:96-99)") {
    val b = toBytes(-1L)
    assert(b.length === 9)
    assert(b.forall(x => (x & 0xff) == 0xff))
    val b2 = toBytes(0x0102030405060708L)
    assert(len(0x0102030405060708L) === 9)
    assert(b2.toSeq.map(_ & 0xff) === Seq(0xff, 1, 2, 3, 4, 5, 6, 7, 8))
  }

  test("randomized round-trip: 4096 uniform values per length class (src/tests.rs:106-131)") {
    val rnd = new Random(0xab) // fixed seed as the reference fixes its seed
    for (n <- 1 to 9) {
      val (min, max) = boundsFor(n)
      val w = new BlockWriter()
      val values = Array.fill(4096) {
        // uniform in [min, max] with unsigned semantics
        val span = max - min // wraps correctly as u64 width
        val v = if (span == -1L) rnd.nextLong()
                else min + java.lang.Long.remainderUnsigned(rnd.nextLong(), span + 1)
        w.putVarint(v)
        v
      }
      val r = new BlockReader(w.result())
      var i = 0
      while (i < values.length) {
        assert(r.getVarint() === values(i))
        i += 1
      }
      assert(!r.hasRemaining)
    }
  }

  test("batch putVarints/readVarints are byte- and value-identical to per-call loops") {
    val rnd = new scala.util.Random(99)
    // mixed length classes incl. growth across the initial capacity
    val vs = Array.fill(5000)(rnd.nextLong() >>> rnd.nextInt(64))
    val a = new BlockWriter(16) // forces several grow cycles mid-batch
    a.putVarints(vs, 0, vs.length)
    val b = new BlockWriter(16)
    vs.foreach(b.putVarint)
    assert(java.util.Arrays.equals(a.result(), b.result()),
      "batch append must be byte-identical to per-call append")
    val sa = new BlockWriter(16)
    sa.putSignedVarints(vs, 0, vs.length)
    val sb = new BlockWriter(16)
    vs.foreach(sb.putSignedVarint)
    assert(java.util.Arrays.equals(sa.result(), sb.result()))
    // batch read matches per-call read
    val r1 = new BlockReader(a.result())
    val out = new Array[Long](vs.length)
    assert(r1.readVarints(out, 0, vs.length) === vs.length)
    assert(out.toSeq === vs.toSeq)
    val so = new Array[Long](vs.length)
    assert(new BlockReader(sa.result()).readSignedVarints(so, 0, vs.length) === vs.length)
    assert(so.toSeq === vs.toSeq)
  }

  test("randomized signed round-trip") {
    val rnd = new Random(0xcd)
    val w = new BlockWriter()
    val values = Array.fill(8192)(rnd.nextLong() >> rnd.nextInt(64))
    values.foreach(w.putSignedVarint)
    val r = new BlockReader(w.result())
    values.foreach(v => assert(r.getSignedVarint() === v))
  }

  test("error: empty buffer -> UnexpectedEob (src/tests.rs:133-139)") {
    intercept[DecodeError.UnexpectedEob](decodePair(Array.emptyByteArray))
    intercept[DecodeError.UnexpectedEob](new BlockReader(Array.emptyByteArray).getVarint())
  }

  test("error: every tag-only prefix -> UnexpectedEob (src/tests.rs:141-153)") {
    for (n <- 2 to 9) {
      // a lone tag byte announcing n total bytes
      val tag = (0xff << (9 - n)) & 0xff
      intercept[DecodeError.UnexpectedEob](decodePair(Array(tag.toByte)))
    }
  }

  test("error: max-value encodings truncated by one byte -> UnexpectedEob, reader drains (src/tests.rs:155-168; src/bytes.rs:44-46)") {
    for (n <- 2 to 9) {
      val full = toBytes(MaxValue(n))
      val truncated = full.take(n - 1)
      intercept[DecodeError.UnexpectedEob](decodePair(truncated))
      val r = new BlockReader(truncated)
      intercept[DecodeError.UnexpectedEob](r.getVarint())
      assert(!r.hasRemaining, "EOB must drain the cursor so iteration terminates")
    }
  }

  test("error: u64::MAX decoded as u32 -> Overflow (src/tests.rs:170-178)") {
    val (v, _) = decodePair(toBytes(-1L))
    intercept[DecodeError.Overflow](checkU32(v))
    intercept[DecodeError.Overflow](checkU16(0x10000L))
    assert(checkU32(0xffffffffL) === 0xffffffffL)
    assert(checkU16(0xffffL) === 0xffffL)
    intercept[DecodeError.Overflow](checkI32(Int.MaxValue.toLong + 1))
    assert(checkI32(Int.MinValue.toLong) === Int.MinValue.toLong)
    intercept[DecodeError.Overflow](checkI16(Short.MinValue - 1L))
  }

  test("invariant: TAG_PREFIX[n] & MAX_VALUE[n] == 0 over the n-byte word (src/tests.rs:180-187)") {
    for (n <- 2 to 8) {
      val tagInWord = TagPrefix64(n) >>> ((8 - n) * 8)
      assert((tagInWord & MaxValue(n)) === 0L, s"n=$n")
    }
  }

  test("non-canonical encodings decode by masking only (src/raw.rs:176-218)") {
    // value 5 padded to 2 bytes: tag 0x80 | 0x0005 -> 0x80 0x05
    val (v, n) = decodePair(Array(0x80.toByte, 0x05.toByte))
    assert(v === 5L && n === 2)
    // but our encoder always emits canonical length
    assert(toBytes(5L).length === 1)
  }

  test("iterator: EOB terminates, values stream correctly (src/tests.rs:256-263)") {
    val w = new BlockWriter()
    val vals = Seq(0L, 127L, 128L, 1L << 42, -1L)
    vals.foreach(w.putVarint)
    val got = new BlockReader(w.result()).varintIterator.toSeq
    assert(got === vals)
  }
}
