package graft.codecs

import graft.core.{BlockReader, BlockWriter}

/** FSST-style static symbol-table string compression (Boncz, Neumann,
  * Leis: "FSST: Fast Random Access String Compression", VLDB 2020 —
  * public paper; implemented from scratch, simplified).
  *
  * A per-chunk table of up to 255 symbols (1..8 bytes, codes 0..254) is
  * trained by iterative greedy re-segmentation of a bounded sample; code
  * 255 escapes a literal byte. Strings are encoded independently,
  * preserving per-row random access.
  *
  * Hot-path design: candidate symbols are packed big-endian left-aligned
  * into a Long and probed in per-length open-addressing maps — no
  * per-position allocation, ≤8 primitive hash probes per input position.
  */
object Fsst {

  final val EscapeCode = 255
  final val MaxSymbols = 255
  final val MaxSymbolLen = 8
  // 5 iterations over a 64 KiB sample is the measured knee: on engine
  // content 3/32K -> 69% of raw, 5/64K -> 59%, 8/128K -> 58% (diminishing)
  final val TrainIterations = 5
  final val SampleCap = 1 << 16 // 64 KiB training sample per chunk

  @inline private def packedMask(len: Int): Long = -1L << ((8 - len) * 8)

  /** Big-endian left-aligned pack of up to 8 bytes at s(off..). */
  @inline private def packAt(s: Array[Byte], off: Int, end: Int): Long = {
    var w = 0L
    var j = 0
    val m = math.min(8, end - off)
    while (j < m) { w |= (s(off + j) & 0xffL) << ((7 - j) * 8); j += 1 }
    w
  }

  /** Immutable trained table with longest-match encode lookup.
    *
    * Encode hot path follows the FSST paper's dispatch structure: a
    * 256-entry first-byte table bounds the probe ladder (a position whose
    * first byte starts no symbol escapes after ONE array read), 1- and
    * 2-byte symbols resolve through direct-indexed short-code tables (no
    * hashing), and only lengths ≥ 3 probe the per-length hash maps.
    * This took the greedy encoder from ~21 MB/s to several-x that — it
    * was 95% of the engine's whole encode cost (profiled at SF).
    */
  final class SymbolTable(val symbols: Array[Array[Byte]]) extends Serializable {
    // Encode-side dispatch tables, built LAZILY on the first encode: the
    // decode path (readTable per decoded block) only walks `symbols`, and
    // eagerly filling code2 (a 65536-entry Int array, ~256 KB) per block
    // was a pure decode-side tax.
    // lookup(len-1): packed(symbol) -> code, for len in 3..8
    @transient private var lookup: Array[LongIntMap] = null
    @transient private var code1: Array[Int] = null
    @transient private var code2: Array[Int] = null
    @transient private var maxLenByFirst: Array[Byte] = null
    private var maxLenV = 0

    private def ensureEncodeTables(): Unit = if (lookup == null) {
      val lk = Array.fill(MaxSymbolLen)(new LongIntMap())
      val c1 = Array.fill(256)(-1)
      val c2 = Array.fill(1 << 16)(-1)
      val mlf = new Array[Byte](256)
      var c = 0
      while (c < symbols.length) {
        val sym = symbols(c)
        val first = sym(0) & 0xff
        sym.length match {
          case 1 => if (c1(first) < 0) c1(first) = c
          case 2 =>
            val k = (first << 8) | (sym(1) & 0xff)
            if (c2(k) < 0) c2(k) = c
          case l => lk(l - 1).put(packAt(sym, 0, sym.length), c)
        }
        if (sym.length > mlf(first)) mlf(first) = sym.length.toByte
        c += 1
      }
      code1 = c1; code2 = c2; maxLenByFirst = mlf; lookup = lk
    }

    def maxLen: Int = {
      if (maxLenV == 0) {
        var m = 1
        var c = 0
        while (c < symbols.length) {
          if (symbols(c).length > m) m = symbols(c).length
          c += 1
        }
        maxLenV = m
      }
      maxLenV
    }

    /** Longest match at s(i): returns (code << 8) | matchedLen, or -1.
      * The lazy-init guard is a single always-predicted null check.
      */
    @inline def longestMatch(s: Array[Byte], i: Int, end: Int): Int = {
      if (lookup == null) ensureEncodeTables()
      val first = s(i) & 0xff
      var len = maxLenByFirst(first).toInt
      if (len == 0) return -1 // no symbol starts with this byte
      val rem = end - i
      if (len > rem) len = rem
      if (len >= 3) {
        val w = packAt(s, i, end)
        while (len >= 3) {
          val code = lookup(len - 1).get(w & packedMask(len))
          if (code >= 0) return (code << 8) | len
          len -= 1
        }
      }
      if (len == 2) {
        val c2 = code2((first << 8) | (s(i + 1) & 0xff))
        if (c2 >= 0) return (c2 << 8) | 2
      }
      val c1 = code1(first)
      if (c1 >= 0) (c1 << 8) | 1 else -1
    }

    /** Greedy longest-match encode of src into w; returns bytes written. */
    def encodeInto(src: Array[Byte], w: BlockWriter): Int = {
      var written = 0
      var i = 0
      val n = src.length
      while (i < n) {
        val m = longestMatch(src, i, n)
        if (m >= 0) {
          w.putByte(m >>> 8)
          written += 1
          i += m & 0xff
        } else {
          w.putByte(EscapeCode)
          w.putByte(src(i) & 0xff)
          written += 2
          i += 1
        }
      }
      written
    }

    def decode(src: Array[Byte], off: Int, encLen: Int, decLen: Int): Array[Byte] = {
      require(decLen >= 0 && encLen >= 0 && off >= 0 && off + encLen <= src.length,
        "FSST decode slice out of range")
      val out = new Array[Byte](decLen)
      var i = off
      val end = off + encLen
      var o = 0
      while (i < end) {
        val c = src(i) & 0xff
        if (c == EscapeCode) {
          require(i + 1 < end, "FSST escape at end of encoded bytes")
          require(o < decLen, "FSST decode overruns declared decoded length")
          out(o) = src(i + 1)
          o += 1
          i += 2
        } else {
          require(c < symbols.length, s"FSST code $c beyond table size ${symbols.length}")
          val sym = symbols(c)
          require(o + sym.length <= decLen, "FSST decode overruns declared decoded length")
          System.arraycopy(sym, 0, out, o, sym.length)
          o += sym.length
          i += 1
        }
      }
      require(o == decLen, s"FSST decode produced $o bytes, expected $decLen")
      out
    }

    def writeTo(w: BlockWriter): Unit = {
      w.putByte(symbols.length)
      var c = 0
      while (c < symbols.length) {
        w.putByte(symbols(c).length)
        w.putBytes(symbols(c))
        c += 1
      }
    }
  }

  def readTable(r: BlockReader): SymbolTable = {
    val n = r.getByte()
    require(n <= MaxSymbols, s"FSST table claims $n symbols (max $MaxSymbols)")
    val syms = new Array[Array[Byte]](n)
    var c = 0
    while (c < n) {
      val l = r.getByte()
      require(l >= 1 && l <= MaxSymbolLen, s"FSST symbol length $l out of [1, $MaxSymbolLen]")
      syms(c) = r.getBytes(l)
      c += 1
    }
    new SymbolTable(syms)
  }

  /** Train a symbol table on a bounded sample: start from literal bytes,
    * then iteratively re-segment with the current table and promote
    * frequent symbols and adjacent-symbol concatenations by gain =
    * frequency x length (the FSST paper's bottom-up construction).
    */
  def train(strings: Array[String], n: Int): SymbolTable = {
    // STRIDED sample with a per-row byte cap: the engine's chunks are
    // sorted (repo, lang, path), so a prefix sample sees only the first
    // ~dozen rows — one repo, one file type — and the trained table fits
    // the rest of the chunk badly (measured on synthesized source content:
    // prefix-sample ratio 0.84-0.89 vs strided 0.54-0.66). The cap spreads
    // the same 64 KiB budget over ~32 rows across the whole chunk.
    val perRow = math.max(1, SampleCap / 32)
    val stride = math.max(1, n / 32)
    var total = 0
    val sample = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < n && total < SampleCap) {
      val b = strings(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val take = math.min(math.min(b.length, perRow), SampleCap - total)
      sample.write(b, 0, take)
      total += take
      i += stride
    }
    val s = sample.toByteArray
    if (s.isEmpty) return new SymbolTable(Array.empty)

    var table = new SymbolTable(Array.empty)
    var iter = 0
    while (iter < TrainIterations) {
      // gains per candidate, keyed by (len, packed prefix)
      val gains = Array.fill(MaxSymbolLen)(new java.util.HashMap[java.lang.Long, java.lang.Long]())
      @inline def bump(off: Int, len: Int): Unit = {
        val k = java.lang.Long.valueOf(packAt(s, off, s.length) & packedMask(len))
        val m = gains(len - 1)
        val cur = m.get(k)
        m.put(k, java.lang.Long.valueOf((if (cur eq null) 0L else cur.longValue()) + len))
      }
      var pos = 0
      var prevStart = -1
      var prevLen = 0
      while (pos < s.length) {
        val m = table.longestMatch(s, pos, s.length)
        val segLen = if (m >= 0) m & 0xff else 1
        bump(pos, segLen)
        if (prevStart >= 0 && prevLen + segLen <= MaxSymbolLen
            && prevStart + prevLen + segLen <= s.length)
          bump(prevStart, prevLen + segLen)
        prevStart = pos
        prevLen = segLen
        pos += segLen
      }
      // collect all candidates, take top-255 by gain (stable order:
      // gain desc, then len desc, then packed value — fully deterministic)
      val cands = new java.util.ArrayList[(Long, Int, Long)]() // (packed, len, gain)
      var len = 1
      while (len <= MaxSymbolLen) {
        val it = gains(len - 1).entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          cands.add((e.getKey.longValue(), len, e.getValue.longValue()))
        }
        len += 1
      }
      cands.sort { (a, b) =>
        val g = java.lang.Long.compare(b._3, a._3)
        if (g != 0) g
        else {
          val l = Integer.compare(b._2, a._2)
          if (l != 0) l else java.lang.Long.compareUnsigned(a._1, b._1)
        }
      }
      val m = math.min(MaxSymbols, cands.size)
      val syms = new Array[Array[Byte]](m)
      var k = 0
      while (k < m) {
        val (packed, slen, _) = cands.get(k)
        val bytes = new Array[Byte](slen)
        var j = 0
        while (j < slen) { bytes(j) = (packed >>> ((7 - j) * 8)).toByte; j += 1 }
        syms(k) = bytes
        k += 1
      }
      table = new SymbolTable(syms)
      iter += 1
    }
    table
  }
}
