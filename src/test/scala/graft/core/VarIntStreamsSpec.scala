package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import scala.util.Random

/** Port of the reference's io round-trip tests (src/tests.rs:315-347). */
class VarIntStreamsSpec extends AnyFunSuite {

  test("io round-trip: 4096 random values per length class") {
    val rnd = new Random(0xab)
    for (n <- 1 to 9) {
      val min = if (n == 1) 0L else PrefixVarInt.MaxValue(n - 1) + 1
      val span = PrefixVarInt.MaxValue(n) - min
      val values = Array.fill(4096)(
        if (span == -1L) rnd.nextLong()
        else min + java.lang.Long.remainderUnsigned(rnd.nextLong(), span + 1))
      val out = new ByteArrayOutputStream()
      values.foreach(VarIntStreams.write(_, out))
      val in = new ByteArrayInputStream(out.toByteArray)
      values.foreach(v => assert(VarIntStreams.read(in) === v))
      assert(in.read() === -1)
    }
  }

  test("io signed round-trip and iterator drain") {
    val rnd = new Random(0xcd)
    val values = Array.fill(4096)(rnd.nextLong() >> rnd.nextInt(64))
    val out = new ByteArrayOutputStream()
    values.foreach(VarIntStreams.writeSigned(_, out))
    val in = new ByteArrayInputStream(out.toByteArray)
    values.foreach(v => assert(VarIntStreams.readSigned(in) === v))
    // iterator form
    val out2 = new ByteArrayOutputStream()
    Seq(0L, 127L, 128L, 1L << 40, -1L).foreach(VarIntStreams.write(_, out2))
    val got = VarIntStreams.iterator(new ByteArrayInputStream(out2.toByteArray)).toSeq
    assert(got === Seq(0L, 127L, 128L, 1L << 40, -1L))
  }

  test("buffered zero-copy reader: parity with read(), tiny buffers force compaction") {
    val rnd = new Random(0xef)
    val values = Array.fill(8192)(rnd.nextLong() >>> rnd.nextInt(64))
    val out = new ByteArrayOutputStream()
    values.foreach(VarIntStreams.write(_, out))
    val bytes = out.toByteArray
    // bufSize 9 (the minimum) forces a compact+refill on nearly every
    // value; 16 and 8192 exercise straddling and the fast path
    for (bufSize <- Seq(9, 16, 8192)) {
      val r = new VarIntStreams.BufferedVarIntReader(new ByteArrayInputStream(bytes), bufSize)
      values.foreach(v => assert(r.read() === v))
      assert(!r.hasNext)
      intercept[DecodeError.UnexpectedEob](r.read())
    }
    // signed + iterator forms
    val out2 = new ByteArrayOutputStream()
    Seq(0L, -3L, 1L << 40, Long.MinValue).foreach(VarIntStreams.writeSigned(_, out2))
    val r2 = new VarIntStreams.BufferedVarIntReader(new ByteArrayInputStream(out2.toByteArray), 9)
    assert(Seq(r2.readSigned(), r2.readSigned(), r2.readSigned(), r2.readSigned())
      === Seq(0L, -3L, 1L << 40, Long.MinValue))
    // truncated value raises Eob
    val full = PrefixVarInt.toBytes(PrefixVarInt.MaxValue(6))
    val r3 = new VarIntStreams.BufferedVarIntReader(
      new ByteArrayInputStream(full.take(4)), 9)
    intercept[DecodeError.UnexpectedEob](r3.read())
  }

  test("io EOF semantics: empty stream and truncated value both raise UnexpectedEob") {
    intercept[DecodeError.UnexpectedEob](
      VarIntStreams.read(new ByteArrayInputStream(Array.emptyByteArray)))
    val full = PrefixVarInt.toBytes(PrefixVarInt.MaxValue(5))
    intercept[DecodeError.UnexpectedEob](
      VarIntStreams.read(new ByteArrayInputStream(full.take(3))))
  }
}
