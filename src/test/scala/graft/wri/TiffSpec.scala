package graft.wri

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class TiffSpec extends AnyFunSuite {
  import TiffIO._

  private val geo = GeoInfo(5070, 90.0, 90.0,
    Model.Expected.xmin, Model.Expected.ymax)

  private def tmp(name: String): String =
    Files.createTempDirectory("tiffspec").resolve(name).toString

  private def testPixels(w: Int, h: Int): Array[Float] =
    Array.tabulate(w * h)(i => (i % 97) * 1.5f - 20f)

  test("LZW codec round-trips arbitrary bytes") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 5, 256, 4096, 70000)) {
      val data = new Array[Byte](n); rnd.nextBytes(data)
      val enc = LzwCodec.encode(data)
      assert(LzwCodec.decode(enc, n).toSeq == data.toSeq, s"n=$n")
    }
    // compressible data should actually compress
    val rep = Array.fill[Byte](10000)(42)
    assert(LzwCodec.encode(rep).length < 2000)
  }

  test("predictors 2 and 3 round-trip") {
    val w = 17; val h = 5
    val raw = new Array[Byte](w * h * 4)
    new scala.util.Random(3).nextBytes(raw)
    for (p <- Seq(1, 2, 3)) {
      val f = TiffIO.applyPredictor(raw, p, w, h)
      assert(TiffIO.undoPredictor(f, p, w, h).toSeq == raw.toSeq, s"p=$p")
    }
  }

  test("plain GeoTIFF write -> header read (F11 fields)") {
    val p = tmp("plain.tif")
    val px = testPixels(40, 30)
    TiffWriter.writeGeoTiff(p, 40, 30, px, geo)
    val h = readHeader(p)
    assert(h.width == 40 && h.height == 30)
    assert(h.bands == 1 && h.datatype == "FLT4S")
    assert(h.epsg.contains(5070))
    assert(h.resX == 90.0 && h.resY == 90.0)
    assert(h.xmin == Model.Expected.xmin && h.ymax == Model.Expected.ymax)
    assert(math.abs(h.xmax - (Model.Expected.xmin + 40 * 90.0)) < 1e-9)
    assert(h.overviewCount == 0)
    val (_, back) = readPixels(p)
    assert(back.toSeq == px.toSeq)
  }

  for (comp <- Seq(Uncompressed, Deflate, Lzw, Zstd); pred <- Seq(1, 2, 3)) {
    test(s"COG round-trip comp=$comp predictor=$pred") {
      val p = tmp(s"cog_${comp}_$pred.tif")
      val w = 70; val hh = 50
      val px = testPixels(w, hh)
      TiffWriter.writeCog(p, w, hh, px, geo,
        TiffWriter.CogOptions(blockSize = 32, compression = comp,
          predictor = pred))
      val h = readHeader(p)
      assert(h.width == w && h.height == hh && h.tiled)
      assert(h.tileWidth == 32 && h.compression == comp.code)
      // 70x50 with 32px blocks: 70->35->18 => 2 overview levels
      assert(h.overviewCount == 2, s"overviews=${h.overviewCount}")
      assert(h.isCogLayout, "IFD chain must precede all pixel data")
      val (_, back) = readPixels(p)
      assert(back.toSeq == px.toSeq)
    }
  }

  test("COG conformance: one prefix read locates every level; tiles are range-readable") {
    val p = tmp("stream.tif")
    val w = 512; val hh = 384
    val px = testPixels(w, hh)
    TiffWriter.writeCog(p, w, hh, px, geo,
      TiffWriter.CogOptions(blockSize = 64, compression = Lzw, predictor = 3))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))

    // range request #1: the first 16 KB must contain the complete IFD
    // chain + every tag array (tile offsets/counts for all levels)
    val prefix = bytes.take(16 * 1024)
    val layouts = levelLayoutsFromPrefix(prefix)
    assert(layouts.length == 4, s"levels=${layouts.length}") // 512->256->128->64
    assert(layouts.head.width == w && layouts.head.height == hh)
    assert(layouts.last.width == 64 && layouts.last.height == 48)
    // strictly header-first: every tile byte of every level sits after the
    // whole header block the prefix parse consumed
    val h = readHeader(p)
    assert(h.isCogLayout)
    assert(layouts.flatMap(_.tileOffsets).min >= h.ifdChainEnd,
      "tile data interleaved with the IFD chain")

    // range request #2: fetch ONLY the smallest overview's tiles
    val small = layouts.last
    val overviewPixels = small.tileOffsets.zip(small.tileByteCounts).map {
      case (off, n) =>
        decodeLevelTile(small, bytes.slice(off.toInt, (off + n).toInt))
    }
    assert(overviewPixels.length == 1) // 64x48 fits one 64x64 tile
    val valid = for (y <- 0 until 48; x <- 0 until 64)
      yield overviewPixels.head(y * 64 + x)
    assert(valid.forall(v => !v.isNaN && v >= px.min && v <= px.max),
      "overview pixels out of source range")
    // economy: the overview fetch reads a small fraction of the file
    assert(small.tileByteCounts.sum < bytes.length / 4,
      s"overview fetch ${small.tileByteCounts.sum} of ${bytes.length}")

    // random access: one full-res tile fetched by range decodes to exactly
    // its source block
    val full = layouts.head
    val t0 = decodeLevelTile(full,
      bytes.slice(full.tileOffsets.head.toInt,
        (full.tileOffsets.head + full.tileByteCounts.head).toInt))
    for (y <- 0 until 64; x <- 0 until 64)
      assert(t0(y * 64 + x) == px(y * w + x), s"full-res tile drift at ($x,$y)")

    // a prefix that cannot hold the chain must fail loudly, not misparse
    intercept[IllegalArgumentException] {
      levelLayoutsFromPrefix(bytes.take(64))
    }
  }

  test("BigTIFF COG round-trips (magic 43, 8-byte offsets)") {
    val p = tmp("big.tif")
    val w = 70; val hh = 50
    val px = testPixels(w, hh)
    TiffWriter.writeCog(p, w, hh, px, geo,
      TiffWriter.CogOptions(blockSize = 32, compression = Deflate,
        predictor = 2, bigTiff = true))
    // magic must actually be 43
    val headBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)).take(4)
    assert(headBytes(2) == 43 && headBytes(3) == 0)
    val h = readHeader(p)
    assert(h.width == w && h.height == hh && h.tiled)
    assert(h.epsg.contains(5070) && h.overviewCount == 2)
    assert(h.isCogLayout)
    val (_, back) = readPixels(p)
    assert(back.toSeq == px.toSeq)
  }

  test("COG with NaN nodata averages NaN-aware") {
    val p = tmp("nan.tif")
    val px = Array.fill(64 * 64)(Float.NaN)
    px(0) = 8f; px(1) = 4f // first 2x2 block has two valid cells
    TiffWriter.writeCog(p, 64, 64, px, geo,
      TiffWriter.CogOptions(blockSize = 32))
    val h = readHeader(p)
    assert(h.overviewCount == 1)
    val (_, back) = readPixels(p)
    assert(back(0) == 8f && back.count(!_.isNaN) == 2)
  }
}
