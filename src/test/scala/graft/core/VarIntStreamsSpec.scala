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

  test("chunked (non-contiguous) reader: values straddle every possible boundary") {
    val rnd = new scala.util.Random(17)
    // one value per length class + random fill, so every multibyte
    // ladder rung crosses chunk boundaries somewhere below
    val values = (1 to 9).map { n =>
      val lo = if (n == 1) 0L else PrefixVarInt.MaxValue(n - 1) + 1
      lo + (rnd.nextLong() & 0xffL)
    } ++ Seq.fill(200)(rnd.nextLong() >>> rnd.nextInt(64))
    val w = new BlockWriter(4096)
    values.foreach(v => w.putVarint(v))
    val bytes = w.result()
    def chunked(sizes: Iterator[Int]): ChunkedBytesReader = {
      val parts = Iterator.unfold(0) { off =>
        if (off >= bytes.length) None
        else {
          val n = math.min(math.max(sizes.next(), 1), bytes.length - off)
          Some((java.util.Arrays.copyOfRange(bytes, off, off + n), off + n))
        }
      }
      new ChunkedBytesReader(parts)
    }
    // every chunk exactly 1 byte: the pure slow path
    assert(chunked(Iterator.continually(1)).varintIterator.toSeq === values)
    // random small chunks: fast/slow path mix with straddling values
    for (seed <- 1 to 10) {
      val r2 = new scala.util.Random(seed)
      assert(chunked(Iterator.continually(1 + r2.nextInt(12))).varintIterator.toSeq
        === values, s"chunking seed $seed")
    }
    // one big chunk: pure fast path
    assert(new ChunkedBytesReader(Seq(bytes)).varintIterator.toSeq === values)
    // truncation mid-value drains with Eob (iteration terminates)
    val cut = new ChunkedBytesReader(Seq(
      java.util.Arrays.copyOf(bytes, bytes.length - 1)))
    intercept[DecodeError.UnexpectedEob] { cut.varintIterator.toSeq }
    assert(!cut.hasRemaining, "Eob must drain the cursor")
    // narrow u32: Overflow for wide values, then CONTINUE (reference
    // chunked-Buf contract)
    val w2 = new BlockWriter(64)
    Seq(7L, 1L << 40, 9L).foreach(v => w2.putVarint(v))
    val got = new ChunkedBytesReader(
      w2.result().grouped(2).toSeq).varintIterator32.toSeq
    assert(got(0) === Right(7L))
    assert(got(1).isLeft && got(1).swap.exists(_.isInstanceOf[DecodeError.Overflow]))
    assert(got(2) === Right(9L))
  }
}
