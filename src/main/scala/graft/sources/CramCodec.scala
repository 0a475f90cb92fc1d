package graft.sources

import java.io.{ByteArrayOutputStream, EOFException}
import java.util.zip.CRC32

/** Low-level CRAM 3.0 primitives in pure JDK (SURVEY.md S1 — the
  * reference accepts CRAM via htsjdk/`sc.loadAlignments`,
  * avocado-cli/.../BiallelicGenotyper.scala:218-222; no htsjdk exists in
  * this build, so the container/codec layer is implemented from the
  * public GA4GH CRAM 3.0 specification).
  *
  * This file holds the byte-level pieces shared by the reader and the
  * writer: ITF-8 / LTF-8 varints, the MSB-first core bit stream, the
  * rANS 4x8 entropy codec (order-0 and order-1, both directions), and
  * canonical-Huffman code assignment. Container/slice/record structure
  * lives in [[Cram]].
  */
private[sources] object CramCodec {

  // ---- byte cursors ----------------------------------------------------

  /** Mutable cursor over a byte array (the external-block read model:
    * every CRAM external block is a sequential stream of ITF-8 ints or
    * raw bytes).
    */
  final class ByteCursor(val buf: Array[Byte], var pos: Int = 0) {
    def u8(): Int = {
      if (pos >= buf.length) throw new EOFException(s"cursor past end ($pos/${buf.length})")
      val b = buf(pos) & 0xff; pos += 1; b
    }
    def bytes(n: Int): Array[Byte] = {
      if (pos + n > buf.length) throw new EOFException(s"wanted $n bytes at $pos/${buf.length}")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def hasRemaining: Boolean = pos < buf.length
    def remaining: Int = buf.length - pos
  }

  // ---- ITF-8 / LTF-8 varints (CRAM 3.0 spec §2.3) ----------------------

  /** ITF-8: UTF-8-style prefixed int. The 5-byte form carries only the
    * low nibble of the final byte (32 bits total).
    */
  def readItf8(c: ByteCursor): Int = {
    val b1 = c.u8()
    if ((b1 & 0x80) == 0) b1
    else if ((b1 & 0x40) == 0) ((b1 & 0x3f) << 8) | c.u8()
    else if ((b1 & 0x20) == 0) ((b1 & 0x1f) << 16) | (c.u8() << 8) | c.u8()
    else if ((b1 & 0x10) == 0) ((b1 & 0x0f) << 24) | (c.u8() << 16) | (c.u8() << 8) | c.u8()
    else ((b1 & 0x0f) << 28) | (c.u8() << 20) | (c.u8() << 12) | (c.u8() << 4) | (c.u8() & 0x0f)
  }

  def writeItf8(out: ByteArrayOutputStream, v: Int): Unit = {
    if ((v >>> 7) == 0) out.write(v)
    else if ((v >>> 14) == 0) { out.write(0x80 | (v >>> 8)); out.write(v & 0xff) }
    else if ((v >>> 21) == 0) {
      out.write(0xc0 | (v >>> 16)); out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    } else if ((v >>> 28) == 0) {
      out.write(0xe0 | (v >>> 24)); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    } else {
      out.write(0xf0 | (v >>> 28)); out.write((v >>> 20) & 0xff)
      out.write((v >>> 12) & 0xff); out.write((v >>> 4) & 0xff); out.write(v & 0x0f)
    }
  }

  /** LTF-8: the long-typed sibling (record counters / base counts). */
  def readLtf8(c: ByteCursor): Long = {
    val b1 = c.u8()
    def n(k: Int): Long = {
      var v = 0L; var i = 0
      while (i < k) { v = (v << 8) | c.u8(); i += 1 }
      v
    }
    if ((b1 & 0x80) == 0) b1.toLong
    else if ((b1 & 0x40) == 0) ((b1 & 0x3fL) << 8) | n(1)
    else if ((b1 & 0x20) == 0) ((b1 & 0x1fL) << 16) | n(2)
    else if ((b1 & 0x10) == 0) ((b1 & 0x0fL) << 24) | n(3)
    else if ((b1 & 0x08) == 0) ((b1 & 0x07L) << 32) | n(4)
    else if ((b1 & 0x04) == 0) ((b1 & 0x03L) << 40) | n(5)
    else if ((b1 & 0x02) == 0) ((b1 & 0x01L) << 48) | n(6)
    else if ((b1 & 0x01) == 0) n(7)
    else n(8)
  }

  def writeLtf8(out: ByteArrayOutputStream, v: Long): Unit = {
    def hi(k: Int): Unit = { // write low k bytes big-endian
      var i = k - 1
      while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    if ((v >>> 7) == 0) out.write(v.toInt)
    else if ((v >>> 14) == 0) { out.write((0x80 | (v >>> 8)).toInt); hi(1) }
    else if ((v >>> 21) == 0) { out.write((0xc0 | (v >>> 16)).toInt); hi(2) }
    else if ((v >>> 28) == 0) { out.write((0xe0 | (v >>> 24)).toInt); hi(3) }
    else if ((v >>> 35) == 0) { out.write((0xf0 | (v >>> 32)).toInt); hi(4) }
    else if ((v >>> 42) == 0) { out.write((0xf8 | (v >>> 40)).toInt); hi(5) }
    else if ((v >>> 49) == 0) { out.write((0xfc | (v >>> 48)).toInt); hi(6) }
    else if ((v >>> 56) == 0) { out.write(0xfe); hi(7) }
    else { out.write(0xff); hi(8) }
  }

  def itf8Bytes(v: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream(5); writeItf8(o, v); o.toByteArray
  }

  // ---- core-block bit streams (MSB first) ------------------------------

  final class BitReader(buf: Array[Byte]) {
    private var bytePos = 0
    private var bitPos = 0
    def readBit(): Int = {
      if (bytePos >= buf.length) throw new EOFException("core bit stream exhausted")
      val b = (buf(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    def writeBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit((v >> i) & 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write(cur << (8 - nBits)); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  // ---- canonical Huffman (codec id 3) ----------------------------------

  /** Canonical code assignment: symbols ordered by (bit length, symbol),
    * codes increment within a length and left-shift across lengths — the
    * same construction htsjdk/htslib use, so interop holds. A single
    * zero-length symbol decodes with no bits read.
    */
  final class Huffman(alphabet: Array[Int], lengths: Array[Int]) {
    private val sorted = alphabet.zip(lengths).sortBy { case (s, l) => (l, s) }
    private val codes: Array[Long] = { // (len<<32)|code per sorted symbol
      val out = new Array[Long](sorted.length)
      var code = 0
      var prevLen = sorted.headOption.map(_._2).getOrElse(0)
      var i = 0
      while (i < sorted.length) {
        val len = sorted(i)._2
        code <<= (len - prevLen)
        out(i) = (len.toLong << 32) | (code.toLong & 0xffffffffL)
        code += 1
        prevLen = len
        i += 1
      }
      out
    }
    val zeroBit: Boolean = sorted.length == 1 && sorted.head._2 == 0

    def decode(bits: BitReader): Int = {
      if (zeroBit) return sorted.head._1
      var code = 0
      var len = 0
      var i = 0
      while (i < sorted.length) {
        val want = sorted(i)._2
        while (len < want) { code = (code << 1) | bits.readBit(); len += 1 }
        if ((codes(i) >>> 32).toInt == len && (codes(i) & 0xffffffffL) == (code.toLong & 0xffffffffL))
          return sorted(i)._1
        i += 1
      }
      throw new IllegalStateException("huffman: no code matched (corrupt core stream)")
    }

    def encode(bits: BitWriter, sym: Int): Unit = {
      if (zeroBit) {
        require(sym == sorted.head._1, s"huffman: symbol $sym not the single-code symbol")
        return
      }
      var i = 0
      while (i < sorted.length) {
        if (sorted(i)._1 == sym) {
          bits.writeBits((codes(i) & 0xffffffffL).toInt, (codes(i) >>> 32).toInt)
          return
        }
        i += 1
      }
      throw new IllegalArgumentException(s"huffman: symbol $sym not in alphabet")
    }
  }

  /** Huffman code lengths from frequencies (plain two-queue tree build;
    * the writer's alphabets are tiny). Single symbol → length 0.
    */
  def huffmanLengths(freqs: Map[Int, Long]): (Array[Int], Array[Int]) = {
    val syms = freqs.keys.toArray.sorted
    if (syms.length == 1) return (syms, Array(0))
    // node = (weight, symbols); merge two lightest until one remains
    var nodes: List[(Long, List[Int])] = syms.map(s => (freqs(s), List(s))).toList.sortBy(_._1)
    val depth = collection.mutable.Map[Int, Int]().withDefaultValue(0)
    while (nodes.size > 1) {
      val a :: b :: rest = nodes: @unchecked
      (a._2 ++ b._2).foreach(s => depth(s) += 1)
      nodes = ((a._1 + b._1, a._2 ++ b._2) :: rest).sortBy(_._1)
    }
    (syms, syms.map(depth(_)))
  }

  // ---- rANS 4x8 (block compression method 4) ---------------------------
  //
  // Public algorithm: GA4GH CRAM 3.0 spec + htscodecs rans4x8. Stream:
  // order byte, compressed size (int32 LE), raw size (int32 LE),
  // frequency table(s), then 4 interleaved rANS states. TOTFREQ = 4096.

  private val RansLow = 1 << 23
  private val TotFreq = 4096

  private def readFreq(c: ByteCursor): Int = {
    val x = c.u8()
    if (x >= 128) ((x & 0x7f) << 8) | c.u8() else x
  }

  private def writeFreq(out: ByteArrayOutputStream, f: Int): Unit = {
    if (f < 128) out.write(f)
    else { out.write(0x80 | (f >> 8)); out.write(f & 0xff) }
  }

  /** Read one order-0-style freq table (the spec's RLE symbol walk) into
    * F; returns cumulative table C and a 4096-entry symbol lookup.
    */
  private def readFreqTable0(c: ByteCursor, fr: Array[Int], cum: Array[Int],
      lookup: Array[Byte]): Unit = {
    var rle = 0
    var j = c.u8()
    var last = -1
    var done = false
    while (!done) {
      fr(j) = readFreq(c)
      last = j
      if (rle > 0) { rle -= 1; j += 1 }
      else {
        j = c.u8()
        if (j == last + 1) rle = c.u8()
      }
      if (j == 0 && rle == 0) done = true
    }
    var x = 0
    var s = 0
    while (s < 256) {
      cum(s) = x
      var k = 0
      while (k < fr(s)) { lookup(x + k) = s.toByte; k += 1 }
      x += fr(s)
      s += 1
    }
    require(x <= TotFreq, s"rans: frequency table sums to $x > $TotFreq")
  }

  /** The RLE symbol walk on the write side, mirroring the decode loop:
    * a symbol byte is omitted while inside a run; the SECOND symbol of a
    * consecutive run is written and followed by the count of FURTHER
    * consecutive symbols (htscodecs rans4x8 table format).
    */
  private def writeFreqTable0(out: ByteArrayOutputStream, fr: Array[Int]): Unit = {
    var rle = 0
    var j = 0
    while (j < 256) {
      if (fr(j) > 0) {
        if (rle > 0) rle -= 1
        else {
          out.write(j)
          if (j > 0 && fr(j - 1) > 0) { // continuing a run: announce its tail length
            var k = j + 1
            rle = 0
            while (k < 256 && fr(k) > 0) { rle += 1; k += 1 }
            out.write(rle)
          }
        }
        writeFreq(out, fr(j))
      }
      j += 1
    }
    out.write(0)
  }

  /** Normalize raw counts so they sum exactly to 4096 with every present
    * symbol ≥ 1 (largest symbol absorbs the rounding remainder).
    */
  private def normalizeFreqs(counts: Array[Long], total: Long): Array[Int] = {
    val fr = new Array[Int](256)
    if (total == 0) return fr
    var sum = 0
    var maxSym = -1
    var s = 0
    while (s < 256) {
      if (counts(s) > 0) {
        val f = math.max(1, ((counts(s) * TotFreq) / total).toInt)
        fr(s) = f
        sum += f
        if (maxSym < 0 || fr(s) > fr(maxSym)) maxSym = s
      }
      s += 1
    }
    // absorb the rounding delta into the most frequent symbol
    fr(maxSym) += TotFreq - sum
    require(fr(maxSym) > 0, "rans: normalization underflow (too many distinct symbols)")
    fr
  }

  private def encSymbol(x0: Long, freq: Int, cum: Int, sink: ByteArrayOutputStream): Long = {
    var x = x0
    val xMax = ((RansLow.toLong >> 12) << 8) * freq
    while (x >= xMax) { sink.write((x & 0xff).toInt); x >>= 8 }
    ((x / freq) << 12) + (x % freq) + cum
  }

  /** rANS order-0 compress (used by the writer for int-heavy external
    * blocks); emits the full CRAM method-4 stream including the header.
    */
  def ransCompressO0(in: Array[Byte]): Array[Byte] = {
    val counts = new Array[Long](256)
    in.foreach(b => counts(b & 0xff) += 1)
    val fr = normalizeFreqs(counts, in.length.toLong)
    val cum = new Array[Int](256)
    var x = 0
    var s = 0
    while (s < 256) { cum(s) = x; x += fr(s); s += 1 }

    val table = new ByteArrayOutputStream()
    writeFreqTable0(table, fr)

    // encode in reverse; renorm bytes collect reversed
    val rev = new ByteArrayOutputStream()
    val states = Array.fill(4)(RansLow.toLong)
    var i = in.length - 1
    while (i >= 0) {
      val j = i & 3
      val sym = in(i) & 0xff
      states(j) = encSymbol(states(j), fr(sym), cum(sym), rev)
      i -= 1
    }
    var j = 3
    while (j >= 0) { // flush high→low so the stream reads little-endian
      val st = states(j)
      rev.write(((st >>> 24) & 0xff).toInt); rev.write(((st >>> 16) & 0xff).toInt)
      rev.write(((st >>> 8) & 0xff).toInt); rev.write((st & 0xff).toInt)
      j -= 1
    }
    val body = rev.toByteArray.reverse
    val out = new ByteArrayOutputStream()
    out.write(0) // order-0
    val compSize = table.size() + body.length
    writeInt32Le(out, compSize)
    writeInt32Le(out, in.length)
    table.writeTo(out)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** rANS order-1 compress: four states own contiguous quarters, context
    * is the previous byte (0 at quarter start); the `len % 4` tail rides
    * state 3 — mirrors the decoder loop exactly.
    */
  def ransCompressO1(in: Array[Byte]): Array[Byte] = {
    require(in.length >= 4, "rans order-1 needs at least 4 bytes")
    val counts = Array.ofDim[Long](256, 256)
    val totals = new Array[Long](256)
    val isz4 = in.length / 4
    var q = 0
    while (q < 4) { // first byte of each quarter has context 0
      counts(0)(in(q * isz4) & 0xff) += 1; totals(0) += 1
      q += 1
    }
    var i = 0
    while (i < in.length - 1) {
      // within-quarter successor pairs, plus the tail's chain on state 3
      val qEnd = ((i / isz4) + 1) * isz4
      if (i + 1 != qEnd || i + 1 >= 4 * isz4) {
        counts(in(i) & 0xff)(in(i + 1) & 0xff) += 1
        totals(in(i) & 0xff) += 1
      }
      i += 1
    }
    val fr = new Array[Array[Int]](256)
    val cum = new Array[Array[Int]](256)
    var ctx = 0
    while (ctx < 256) {
      if (totals(ctx) > 0) {
        fr(ctx) = normalizeFreqs(counts(ctx), totals(ctx))
        val c = new Array[Int](256)
        var x = 0
        var s = 0
        while (s < 256) { c(s) = x; x += fr(ctx)(s); s += 1 }
        cum(ctx) = c
      }
      ctx += 1
    }

    // context table: the same RLE walk over contexts, nested freq table each
    val table = new ByteArrayOutputStream()
    var rleC = 0
    var jc = 0
    while (jc < 256) {
      if (totals(jc) > 0) {
        if (rleC > 0) rleC -= 1
        else {
          table.write(jc)
          if (jc > 0 && totals(jc - 1) > 0) {
            var k = jc + 1
            rleC = 0
            while (k < 256 && totals(k) > 0) { rleC += 1; k += 1 }
            table.write(rleC)
          }
        }
        writeFreqTable0(table, fr(jc))
      }
      jc += 1
    }
    table.write(0)

    val rev = new ByteArrayOutputStream()
    val states = Array.fill(4)(RansLow.toLong)
    // tail first (encoded in reverse): positions len-1 .. 4*isz4 on state 3
    i = in.length - 1
    while (i >= 4 * isz4) {
      val c0 = in(i - 1) & 0xff
      val sym = in(i) & 0xff
      states(3) = encSymbol(states(3), fr(c0)(sym), cum(c0)(sym), rev)
      i -= 1
    }
    var k = isz4 - 1
    while (k >= 0) {
      var j = 3
      while (j >= 0) {
        val pos = j * isz4 + k
        val sym = in(pos) & 0xff
        val c0 = if (k == 0) 0 else in(pos - 1) & 0xff
        states(j) = encSymbol(states(j), fr(c0)(sym), cum(c0)(sym), rev)
        j -= 1
      }
      k -= 1
    }
    var j = 3
    while (j >= 0) {
      val st = states(j)
      rev.write(((st >>> 24) & 0xff).toInt); rev.write(((st >>> 16) & 0xff).toInt)
      rev.write(((st >>> 8) & 0xff).toInt); rev.write((st & 0xff).toInt)
      j -= 1
    }
    val body = rev.toByteArray.reverse
    val out = new ByteArrayOutputStream()
    out.write(1) // order-1
    writeInt32Le(out, table.size() + body.length)
    writeInt32Le(out, in.length)
    table.writeTo(out)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** rANS decompress, both orders (CRAM block method 4). */
  def ransDecompress(data: Array[Byte]): Array[Byte] = {
    val c = new ByteCursor(data)
    val order = c.u8()
    val compSize = readInt32Le(c)
    val rawSize = readInt32Le(c)
    require(compSize == c.remaining,
      s"rans: declared compressed size $compSize != ${c.remaining} available")
    val out = new Array[Byte](rawSize)
    if (rawSize == 0) return out
    if (order == 0) {
      val fr = new Array[Int](256)
      val cum = new Array[Int](256)
      val lookup = new Array[Byte](TotFreq)
      readFreqTable0(c, fr, cum, lookup)
      val states = new Array[Long](4)
      var j = 0
      while (j < 4) { states(j) = readUint32Le(c); j += 1 }
      var i = 0
      while (i < rawSize) {
        val k = i & 3
        val m = (states(k) & (TotFreq - 1)).toInt
        val sym = lookup(m) & 0xff
        out(i) = sym.toByte
        states(k) = fr(sym) * (states(k) >> 12) + m - cum(sym)
        while (states(k) < RansLow && c.hasRemaining) states(k) = (states(k) << 8) | c.u8()
        i += 1
      }
      out
    } else if (order == 1) {
      val fr = new Array[Array[Int]](256)
      val cum = new Array[Array[Int]](256)
      val lookup = new Array[Array[Byte]](256)
      var rle = 0
      var ctx = c.u8()
      var last = -1
      var done = false
      while (!done) {
        fr(ctx) = new Array[Int](256)
        cum(ctx) = new Array[Int](256)
        lookup(ctx) = new Array[Byte](TotFreq)
        readFreqTable0(c, fr(ctx), cum(ctx), lookup(ctx))
        last = ctx
        if (rle > 0) { rle -= 1; ctx += 1 }
        else {
          ctx = c.u8()
          if (ctx == last + 1) rle = c.u8()
        }
        if (ctx == 0 && rle == 0) done = true
      }
      val states = new Array[Long](4)
      var j = 0
      while (j < 4) { states(j) = readUint32Le(c); j += 1 }
      val isz4 = rawSize / 4
      val pos = Array(0, isz4, 2 * isz4, 3 * isz4)
      val lastSym = new Array[Int](4)
      var k = 0
      while (k < isz4) {
        j = 0
        while (j < 4) {
          val m = (states(j) & (TotFreq - 1)).toInt
          val sym = lookup(lastSym(j))(m) & 0xff
          out(pos(j)) = sym.toByte
          states(j) = fr(lastSym(j))(sym) * (states(j) >> 12) + m - cum(lastSym(j))(sym)
          while (states(j) < RansLow && c.hasRemaining) states(j) = (states(j) << 8) | c.u8()
          lastSym(j) = sym
          pos(j) += 1
          j += 1
        }
        k += 1
      }
      while (pos(3) < rawSize) { // the % 4 tail rides state 3
        val m = (states(3) & (TotFreq - 1)).toInt
        val sym = lookup(lastSym(3))(m) & 0xff
        out(pos(3)) = sym.toByte
        states(3) = fr(lastSym(3))(sym) * (states(3) >> 12) + m - cum(lastSym(3))(sym)
        while (states(3) < RansLow && c.hasRemaining) states(3) = (states(3) << 8) | c.u8()
        lastSym(3) = sym
        pos(3) += 1
      }
      out
    } else throw new IllegalArgumentException(s"rans: unknown order $order")
  }

  // ---- little-endian ints ----------------------------------------------

  def readInt32Le(c: ByteCursor): Int =
    c.u8() | (c.u8() << 8) | (c.u8() << 16) | (c.u8() << 24)

  def readUint32Le(c: ByteCursor): Long = readInt32Le(c).toLong & 0xffffffffL

  def writeInt32Le(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  def crc32(buf: Array[Byte], from: Int, until: Int): Int = {
    val crc = new CRC32
    crc.update(buf, from, until - from)
    crc.getValue.toInt
  }
}
