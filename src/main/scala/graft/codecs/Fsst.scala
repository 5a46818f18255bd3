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
  * Hot-path design (the paper's §4.4 dispatch): candidate symbols are
  * packed big-endian left-aligned into a Long; lengths ≥ 3 resolve via
  * ONE probe of a 2-way hash bucket keyed on the first 3 bytes, lengths
  * 1-2 via one 65536-entry shortCodes read — no per-position allocation,
  * ≤3 table reads per input position.
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

  /** Long-symbol hash buckets: 2^11 2-way buckets for ≤255 symbols
    * (~6% load); bucket occupancy is decided at symbol-SELECTION time
    * (first two candidates per bucket in gain order are admitted, the
    * rest skipped so their codes go to usable symbols).
    */
  final val HashSlots = 1 << 11
  @inline private def hash3(prefix3: Int): Int =
    (prefix3 * 0x9e3779b1) >>> (32 - 11) // fibonacci hash of the 24-bit prefix

  /** Big-endian left-aligned pack of up to 8 bytes at s(off..): one
    * unaligned word load when 8 bytes remain (the per-position hot op of
    * the greedy encoder — the byte loop was ~85% of whole-engine encode
    * inside longestMatch), byte ladder only at string tails.
    */
  @inline private def packAt(s: Array[Byte], off: Int, end: Int): Long = {
    if (end - off >= 8) graft.core.Mem.getLongBE(s, off)
    else {
      var w = 0L
      var j = 0
      val m = end - off
      while (j < m) { w |= (s(off + j) & 0xffL) << ((7 - j) * 8); j += 1 }
      w
    }
  }

  /** Immutable trained table with longest-match encode lookup.
    *
    * Round-2 used a per-length hash-map ladder (up to 6 probes per input
    * position — measured ~85% of whole-engine encode cost); round 3
    * replaced it with the paper's single-bucket dispatch above, measured
    * 50 -> 100+ MB/s per thread on engine content at a BETTER ratio
    * (0.3998 -> 0.3962, because conflict-aware selection stops spending
    * codes on symbols the lookup could never return).
    */
  final class SymbolTable(val symbols: Array[Array[Byte]]) extends Serializable {
    // Encode-side dispatch, built LAZILY on the first encode (the decode
    // path — readTable per decoded block — only walks `symbols`).
    //
    // The FSST paper's probe structure (§4.4 of Boncz/Neumann/Leis):
    // lengths >= 3 resolve through one 2-way hash bucket keyed by the
    // symbol's first 3 bytes ("lossy perfect hashing" — occupancy is
    // fixed at selection time), lengths 1-2 through one 65536-entry
    // shortCodes lookup on the first two bytes. Training re-segments
    // with the SAME lookup, so symbol gains adapt to bucket eviction.
    @transient private var hashLen: Array[Byte] = null
    @transient private var hashPacked: Array[Long] = null
    @transient private var hashCodeArr: Array[Int] = null
    // VOLATILE publish gate for the lazily built encode tables: the
    // plain-field writes above it in ensureEncodeTables happen-before a
    // reader that observes shortCodes non-null through this volatile
    // read, so a second thread can never see half-built tables (a
    // concurrent double build is benign — the tables are deterministic).
    // Volatile reads are free on x86; the hot loop pays nothing.
    @transient @volatile private var shortCodes: Array[Int] = null
    @transient private var code1: Array[Int] = null
    private var maxLenV = 0

    private def ensureEncodeTables(): Unit = if (shortCodes == null) {
      val hl = new Array[Byte](2 * HashSlots)
      val hp = new Array[Long](2 * HashSlots)
      val hc = new Array[Int](2 * HashSlots)
      val sc = Array.fill(1 << 16)(-1)
      val c1 = Array.fill(256)(-1)
      var c = 0
      while (c < symbols.length) {
        val sym = symbols(c)
        val first = sym(0) & 0xff
        sym.length match {
          case 1 => if (c1(first) < 0) c1(first) = c
          case 2 =>
            val k = (first << 8) | (sym(1) & 0xff)
            // len-2 beats len-1 fills (written below); first-come among len-2
            if (sc(k) < 0 || (sc(k) & 0xff) < 2) sc(k) = (c << 8) | 2
          case l =>
            val packed = packAt(sym, 0, sym.length)
            val b = hash3((packed >>> 40).toInt) << 1 // 2-way bucket
            // first empty of the two ways; symbols arrive gain-ordered
            val idx = if (hl(b) == 0) b else b + 1
            if (hl(idx) == 0) {
              hl(idx) = l.toByte
              hp(idx) = packed
              hc(idx) = c
            }
        }
        c += 1
      }
      // backfill len-1 symbols into every (first, x) shortCodes slot not
      // already holding a len-2 symbol, so one lookup serves both lengths
      var f = 0
      while (f < 256) {
        if (c1(f) >= 0) {
          var x = 0
          while (x < 256) {
            val k = (f << 8) | x
            if (sc(k) < 0) sc(k) = (c1(f) << 8) | 1
            x += 1
          }
        }
        f += 1
      }
      code1 = c1; hashLen = hl; hashPacked = hp; hashCodeArr = hc
      shortCodes = sc // publish last: longestMatch guards on it
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
      * One hash probe (len >= 3) + one shortCodes read (len 1-2); the
      * lazy-init guard is a single always-predicted null check.
      */
    @inline def longestMatch(s: Array[Byte], i: Int, end: Int): Int = {
      if (shortCodes == null) ensureEncodeTables()
      val rem = end - i
      if (rem == 1) { // no second byte: only len-1 symbols are legal
        val c1 = code1(s(i) & 0xff)
        return if (c1 >= 0) (c1 << 8) | 1 else -1
      }
      val w = packAt(s, i, end)
      val b = hash3((w >>> 40).toInt) << 1
      // 2-way bucket: prefer the LONGER matching way (greedy semantics)
      val l0 = hashLen(b)
      val l1 = hashLen(b + 1)
      val m0 = l0 != 0 && l0 <= rem && (w & packedMask(l0)) == hashPacked(b)
      val m1 = l1 != 0 && l1 <= rem && (w & packedMask(l1)) == hashPacked(b + 1)
      if (m0 && (!m1 || l0 >= l1)) return (hashCodeArr(b) << 8) | l0
      if (m1) return (hashCodeArr(b + 1) << 8) | l1
      shortCodes(((w >>> 48)).toInt & 0xffff) // already (code << 8) | len, or -1
    }

    /** Greedy longest-match encode of src into w; returns bytes written.
      * Worst case is 2 output bytes per input byte (every byte escaped),
      * so ONE up-front reservation covers the whole value and the loop
      * writes into the raw backing array — byte-identical output to the
      * per-putByte form, without a capacity test per output byte (round
      * 10; the per-byte form was ~27% of the engine encode leg).
      */
    def encodeInto(src: Array[Byte], w: BlockWriter): Int = {
      val n = src.length
      val b = w.reserveRaw(2 * n)
      val p0 = w.rawPos
      var p = p0
      var i = 0
      while (i < n) {
        val m = longestMatch(src, i, n)
        if (m >= 0) {
          b(p) = (m >>> 8).toByte
          p += 1
          i += m & 0xff
        } else {
          b(p) = EscapeCode.toByte
          b(p + 1) = src(i)
          p += 2
          i += 1
        }
      }
      w.advance(p - p0)
      p - p0
    }

    def decode(src: Array[Byte], off: Int, encLen: Int, decLen: Int): Array[Byte] = {
      val out = new Array[Byte](decLen)
      decodeInto(src, off, encLen, out, 0, decLen)
      out
    }

    /** Decode one value into `dst(dstOff until dstOff+decLen)` — the
      * pool-writing form used by the column decode path (one shared
      * allocation per block instead of one per string).
      */
    def decodeInto(src: Array[Byte], off: Int, encLen: Int,
                   dst: Array[Byte], dstOff: Int, decLen: Int): Unit = {
      require(decLen >= 0 && encLen >= 0 && off >= 0 && off + encLen <= src.length,
        "FSST decode slice out of range")
      require(dstOff >= 0 && dstOff + decLen <= dst.length,
        "FSST decode destination out of range")
      var i = off
      val end = off + encLen
      var o = dstOff
      val oEnd = dstOff + decLen
      while (i < end) {
        val c = src(i) & 0xff
        if (c == EscapeCode) {
          require(i + 1 < end, "FSST escape at end of encoded bytes")
          require(o < oEnd, "FSST decode overruns declared decoded length")
          dst(o) = src(i + 1)
          o += 1
          i += 2
        } else {
          require(c < symbols.length, s"FSST code $c beyond table size ${symbols.length}")
          val sym = symbols(c)
          require(o + sym.length <= oEnd, "FSST decode overruns declared decoded length")
          System.arraycopy(sym, 0, dst, o, sym.length)
          o += sym.length
          i += 1
        }
      }
      require(o == oEnd, s"FSST decode produced ${o - dstOff} bytes, expected $decLen")
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
      // selection mirrors the encode lookup's single-slot constraint: at
      // most ONE len>=3 symbol per hash slot (the first in gain order —
      // the slot's eventual winner under first-wins), so none of the 255
      // codes is wasted on a symbol the lookup could never return
      val claims = new java.util.HashMap[Integer, Integer]()
      val syms = new java.util.ArrayList[Array[Byte]](MaxSymbols)
      var k = 0
      while (k < cands.size && syms.size < MaxSymbols) {
        val (packed, slen, _) = cands.get(k)
        val admit =
          if (slen < 3) true
          else { // at most TWO len>=3 symbols per 2-way bucket
            val h = Integer.valueOf(hash3((packed >>> 40).toInt))
            val cnt = claims.getOrDefault(h, 0)
            if (cnt < 2) { claims.put(h, cnt + 1); true } else false
          }
        if (admit) {
          val bytes = new Array[Byte](slen)
          var j = 0
          while (j < slen) { bytes(j) = (packed >>> ((7 - j) * 8)).toByte; j += 1 }
          syms.add(bytes)
        }
        k += 1
      }
      table = new SymbolTable(syms.toArray(new Array[Array[Byte]](syms.size)))
      iter += 1
    }
    table
  }
}
