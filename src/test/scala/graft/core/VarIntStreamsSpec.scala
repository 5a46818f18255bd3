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

  test("io EOF semantics: empty stream and truncated value both raise UnexpectedEob") {
    intercept[DecodeError.UnexpectedEob](
      VarIntStreams.read(new ByteArrayInputStream(Array.emptyByteArray)))
    val full = PrefixVarInt.toBytes(PrefixVarInt.MaxValue(5))
    intercept[DecodeError.UnexpectedEob](
      VarIntStreams.read(new ByteArrayInputStream(full.take(3))))
  }
}
