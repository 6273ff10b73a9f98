package graft.wri

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** TIFF-variant LZW codec (Adobe TIFF 6.0 spec §13): MSB-first bit
  * packing, ClearCode=256, EOI=257, 9->12 bit codes with TIFF's
  * "early change" (width bumps one code early). Used by the COG writer
  * for COMPRESS=LZW parity with the reference's encoder options
  * (`experiments/test_cog_settings_benchmark.R:39`).
  */
object LzwCodec {

  private val ClearCode = 256
  private val EoiCode = 257
  private val FirstFree = 258
  private val MaxBits = 12

  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new BitWriter
    var dict = mutable.HashMap.empty[List[Byte], Int]
    var nextCode = FirstFree
    var width = 9
    def reset(): Unit = { dict = mutable.HashMap.empty; nextCode = FirstFree; width = 9 }

    out.write(ClearCode, width)
    var prefix: List[Byte] = Nil
    var prefixCode = -1
    var i = 0
    while (i < data.length) {
      val b = data(i)
      val cand = b :: prefix // reversed-order key (cheap prepend)
      val candCode =
        if (prefix.isEmpty) Some(b & 0xff)
        else dict.get(cand)
      candCode match {
        case Some(c) => prefix = cand; prefixCode = c
        case None =>
          out.write(prefixCode, width)
          dict(cand) = nextCode
          nextCode += 1
          // TIFF early change: bump width when nextCode == 2^width - 1
          if (nextCode == (1 << width) - 1 && width < MaxBits) width += 1
          else if (nextCode == (1 << MaxBits) - 1) {
            out.write(ClearCode, width); reset()
          }
          prefix = List(b); prefixCode = b & 0xff
      }
      i += 1
    }
    if (prefix.nonEmpty) out.write(prefixCode, width)
    out.write(EoiCode, width)
    out.result()
  }

  def decode(data: Array[Byte], expected: Int): Array[Byte] = {
    val in = new BitReader(data)
    val out = new ByteArrayOutputStream(expected)
    var table = mutable.ArrayBuffer.empty[Array[Byte]]
    var width = 9
    def reset(): Unit = {
      table = mutable.ArrayBuffer.tabulate(258)(i =>
        if (i < 256) Array(i.toByte) else Array.emptyByteArray)
      width = 9
    }
    reset()
    var prev: Array[Byte] = null
    var done = false
    while (!done && out.size() < expected) {
      val code = in.read(width)
      if (code < 0 || code == EoiCode) done = true
      else if (code == ClearCode) { reset(); prev = null }
      else {
        val entry =
          if (code < table.length && table(code).nonEmpty) table(code)
          else if (prev != null) prev :+ prev(0)
          else throw new IllegalArgumentException("bad LZW stream")
        out.write(entry, 0, entry.length)
        if (prev != null) {
          table += (prev :+ entry(0))
        }
        prev = entry
        // early change on decode: the decoder's table trails the encoder
        // by one entry, so it must widen one entry earlier than the
        // encoder's (2^width - 1) threshold
        if (table.length == (1 << width) - 2 && width < MaxBits) width += 1
      }
    }
    out.toByteArray
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def write(code: Int, width: Int): Unit = {
      acc = (acc << width) | (code.toLong & ((1L << width) - 1))
      nbits += width
      while (nbits >= 8) {
        out.write(((acc >> (nbits - 8)) & 0xff).toInt)
        nbits -= 8
      }
    }
    def result(): Array[Byte] = {
      if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
      out.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var bitPos = 0L
    def read(width: Int): Int = {
      if (bitPos + width > data.length.toLong * 8) return -1
      var v = 0
      var i = 0
      while (i < width) {
        val byteI = ((bitPos + i) / 8).toInt
        val bitI = (7 - ((bitPos + i) % 8)).toInt
        v = (v << 1) | ((data(byteI) >> bitI) & 1)
        i += 1
      }
      bitPos += width
      v
    }
  }
}
