package graft.wri

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** Pure-JVM GeoTIFF I/O (SURVEY §2.1 S2/S7, §2.7 F11).
  *
  * Implements exactly the subset the WRI pipeline needs — single-band
  * Float32 rasters with the GeoTIFF tags the reference reads
  * (`utils.R:175-214`: dims, resolution, extent, EPSG, datatype) — plus a
  * Cloud-Optimized-GeoTIFF writer (tiled, compressed, overview pyramid,
  * header-first IFD layout) standing in for the reference's
  * `gdal_translate -of COG` subprocess (`01b:93-99`). No GDAL dependency.
  *
  * TIFF 6.0 structure from the public Adobe TIFF 6.0 specification;
  * GeoTIFF keys from OGC GeoTIFF 1.1 (public).
  */
object TiffIO {

  // tag ids
  private val TImageWidth = 256
  private val TImageLength = 257
  private val TBitsPerSample = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TPredictor = 317
  private val TTileWidth = 322
  private val TTileLength = 323
  private val TTileOffsets = 324
  private val TTileByteCounts = 325
  private val TSampleFormat = 339
  private val TModelPixelScale = 33550
  private val TModelTiepoint = 33922
  private val TGeoKeyDirectory = 34735

  sealed trait Compression { def code: Int }
  case object Uncompressed extends Compression { val code = 1 }
  case object Lzw extends Compression { val code = 5 }
  case object Deflate extends Compression { val code = 8 }
  case object Zstd extends Compression { val code = 50000 } // GDAL's ZSTD code

  sealed trait Resampling
  case object Nearest extends Resampling
  case object Average extends Resampling

  case class GeoInfo(epsg: Int, resX: Double, resY: Double,
      xmin: Double, ymax: Double)

  /** Everything the inventory stage needs from a header (no pixel read). */
  case class Header(
      width: Int, height: Int, bands: Int,
      bitsPerSample: Int, sampleFormat: Int,
      compression: Int, tiled: Boolean,
      tileWidth: Int, tileHeight: Int,
      resX: Double, resY: Double,
      xmin: Double, ymax: Double,
      epsg: Option[Int],
      overviewCount: Int,
      // for the COG structural check: highest tile/strip data offset of the
      // first IFD vs position of the last IFD — COG = all IFDs before data
      ifdChainEnd: Long, firstDataOffset: Long) {
    def xmax: Double = xmin + width * resX
    def ymin: Double = ymax - height * resY
    def datatype: String =
      if (bitsPerSample == 32 && sampleFormat == 3) "FLT4S"
      else s"B${bitsPerSample}F$sampleFormat"
    def isCogLayout: Boolean = ifdChainEnd <= firstDataOffset
  }

  // ---------------------------------------------------------------------
  // Reader
  // ---------------------------------------------------------------------

  private case class Entry(tag: Int, typ: Int, count: Long, valueOffset: Long,
      raw: Array[Byte])

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1
    case 3 | 8 => 2
    case 4 | 9 | 11 => 4
    case 5 | 10 | 12 | 16 | 17 => 8 // incl. BigTIFF LONG8/SLONG8
    case _ => 1
  }

  /** Reads only the header bytes of a GeoTIFF (never pixel payloads),
    * resolving bare/local paths against the default filesystem. */
  def readHeader(path: String): Header = readHeader(path, WriFs.defaultConf)

  /** Scheme-agnostic header read: the same bounded reads (magic, IFD
    * chain, tag value arrays — KBs, never pixels), issued through
    * [[RangeReader]] so the inventory stage reads headers wherever the
    * rasters live — local disk, `hdfs://`, any Hadoop scheme, or the
    * reference's hosted-raster HTTP serving mode (`README.md:329-335`),
    * where each bounded read is one `Range: bytes=a-b` request. */
  def readHeader(path: String,
      conf: org.apache.hadoop.conf.Configuration): Header = {
    val r = RangeReader.open(path, conf)
    try readHeader(r) finally r.close()
  }

  private def readHeader(reader: RangeReader): Header = {
    def readAt(off: Long, len: Int): ByteBuffer = {
      val b = new Array[Byte](len)
      reader.readFully(off, b)
      ByteBuffer.wrap(b)
    }
    val head = readAt(0, 16)
    val le = (head.get(0) & 0xff, head.get(1) & 0xff) match {
      case (0x49, 0x49) => true
      case (0x4d, 0x4d) => false
      case _ => throw new IllegalArgumentException("not a TIFF (byte order)")
    }
    val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    head.order(order)
    val magic = head.getShort(2).toInt
    val big = magic == 43 // BigTIFF: 8-byte offsets, 20-byte IFD entries
    if (magic != 42 && magic != 43)
      throw new IllegalArgumentException(s"not a TIFF (magic $magic)")
    val inlineMax = if (big) 8 else 4
    val ifdOff =
      if (big) head.getLong(8)
      else head.getInt(4).toLong & 0xffffffffL
    if (ifdOff == 0) throw new IllegalArgumentException("no IFD")

    def parseIfd(off: Long): (Map[Int, Entry], Long, Long) = {
      val (n, entryBase, entrySize) =
        if (big) {
          val nb = readAt(off, 8); nb.order(order)
          (nb.getLong(0).toInt, off + 8, 20)
        } else {
          val nb = readAt(off, 2); nb.order(order)
          (nb.getShort(0).toInt & 0xffff, off + 2, 12)
        }
      val nextSize = if (big) 8 else 4
      val buf = readAt(entryBase, n * entrySize + nextSize); buf.order(order)
      val entries = (0 until n).map { i =>
        val base = i * entrySize
        val tag = buf.getShort(base).toInt & 0xffff
        val typ = buf.getShort(base + 2).toInt & 0xffff
        val count =
          if (big) buf.getLong(base + 4)
          else buf.getInt(base + 4).toLong & 0xffffffffL
        val raw = new Array[Byte](inlineMax)
        buf.position(base + (if (big) 12 else 8)); buf.get(raw); buf.position(0)
        val vb = ByteBuffer.wrap(raw).order(order)
        val vo = if (big) vb.getLong(0) else vb.getInt(0).toLong & 0xffffffffL
        Entry(tag, typ, count, vo, raw)
      }.map(e => e.tag -> e).toMap
      val next =
        if (big) buf.getLong(n * entrySize)
        else buf.getInt(n * entrySize).toLong & 0xffffffffL
      (entries, next, entryBase + n * entrySize + nextSize)
    }

    def values(e: Entry): IndexedSeq[Long] = {
      val total = typeSize(e.typ) * e.count.toInt
      val buf =
        if (total <= inlineMax) ByteBuffer.wrap(e.raw).order(order)
        else { val b = readAt(e.valueOffset, total); b.order(order); b }
      (0 until e.count.toInt).map { i =>
        e.typ match {
          case 3 | 8 => buf.getShort(i * 2).toLong & 0xffffL
          case 4 | 9 => buf.getInt(i * 4).toLong & 0xffffffffL
          case 16 | 17 => buf.getLong(i * 8) // BigTIFF LONG8/SLONG8
          case 1 | 2 | 6 | 7 => buf.get(i).toLong & 0xffL
          case _ => throw new IllegalArgumentException(s"type ${e.typ} as long")
        }
      }
    }
    def doubles(e: Entry): IndexedSeq[Double] = {
      require(e.typ == 12, "expected DOUBLE tag")
      val buf =
        if (8 * e.count.toInt <= inlineMax)
          ByteBuffer.wrap(e.raw).order(order)
        else { val b = readAt(e.valueOffset, 8 * e.count.toInt); b.order(order); b }
      (0 until e.count.toInt).map(i => buf.getDouble(i * 8))
    }

    val (ifd0, next0, chainEnd0) = parseIfd(ifdOff)
    // walk the IFD chain (overviews) to count them + find chain end
    var overviews = 0
    var next = next0
    var chainEnd = chainEnd0
    while (next != 0 && overviews < 32) {
      val (_, n2, ce) = parseIfd(next)
      overviews += 1; next = n2; chainEnd = math.max(chainEnd, ce)
    }

    def lv(tag: Int, default: Long = 0): Long =
      ifd0.get(tag).map(values(_).head).getOrElse(default)

    val width = lv(TImageWidth).toInt
    val height = lv(TImageLength).toInt
    val tiled = ifd0.contains(TTileOffsets)
    val dataOffsets =
      ifd0.get(if (tiled) TTileOffsets else TStripOffsets)
        .map(values).getOrElse(IndexedSeq.empty)
    val scale = ifd0.get(TModelPixelScale).map(doubles)
    val tie = ifd0.get(TModelTiepoint).map(doubles)
    val epsg = ifd0.get(TGeoKeyDirectory).map(values).flatMap { keys =>
      // GeoKeyDirectory: groups of 4 shorts; key 3072 = ProjectedCRS
      keys.drop(4).grouped(4).collectFirst {
        case IndexedSeq(3072L, _, _, v) => v.toInt
      }
    }
    Header(
      width = width, height = height,
      bands = lv(TSamplesPerPixel, 1).toInt,
      bitsPerSample = lv(TBitsPerSample, 1).toInt,
      sampleFormat = lv(TSampleFormat, 1).toInt,
      compression = lv(TCompression, 1).toInt,
      tiled = tiled,
      tileWidth = lv(TTileWidth).toInt, tileHeight = lv(TTileLength).toInt,
      resX = scale.map(_(0)).getOrElse(0.0),
      resY = scale.map(_(1)).getOrElse(0.0),
      xmin = tie.map(_(3)).getOrElse(0.0),
      ymax = tie.map(_(4)).getOrElse(0.0),
      epsg = epsg,
      overviewCount = overviews,
      ifdChainEnd = chainEnd,
      firstDataOffset = if (dataOffsets.isEmpty) Long.MaxValue
        else dataOffsets.min)
  }

  /** Reads the full single-band Float32 pixel payload (small files /
    * tests / COG re-encode input). Handles strips and tiles; NONE, LZW,
    * DEFLATE and ZSTD compression; predictors 1/2/3. */
  def readPixels(path: String): (Header, Array[Float]) =
    readPixels(path, WriFs.defaultConf)

  /** Scheme-agnostic full decode: one [[RangeReader]] read of the whole
    * object (this path exists for small files / tests / COG re-encode
    * input — windowed production reads go through [[CogQuery]]). */
  def readPixels(path: String,
      conf: org.apache.hadoop.conf.Configuration): (Header, Array[Float]) = {
    val h = readHeader(path, conf)
    require(h.bands == 1 && h.bitsPerSample == 32 && h.sampleFormat == 3,
      s"only single-band Float32 supported, got $h")
    val bytes = {
      val r = RangeReader.open(path, conf)
      try {
        require(r.length <= Int.MaxValue.toLong,
          s"$path too large for a full in-memory decode: ${r.length} bytes")
        val b = new Array[Byte](r.length.toInt)
        r.readFully(0L, b)
        b
      } finally r.close()
    }
    {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      // re-parse offsets/counts from IFD0 via a minimal second pass
      val (offs, counts, tw, th) = stripOrTileInfo(bb)
      val out = new Array[Float](h.width * h.height)
      if (!h.tiled) {
        // strips: rows concatenated
        var row = 0
        val rowsPerStrip = math.max(1, math.ceil(h.height.toDouble / offs.length).toInt)
        offs.indices.foreach { i =>
          val comp = bytes.slice(offs(i).toInt, (offs(i) + counts(i)).toInt)
          val nRows = math.min(rowsPerStrip, h.height - row)
          val raw = decompress(comp, h.compression, nRows * h.width * 4)
          val undone = undoPredictor(raw, predictorOf(bb), h.width, nRows)
          val fb = ByteBuffer.wrap(undone).order(ByteOrder.LITTLE_ENDIAN)
          (0 until nRows * h.width).foreach { j =>
            out(row * h.width + j) = fb.getFloat(j * 4)
          }
          row += nRows
        }
      } else {
        val tilesAcross = (h.width + tw - 1) / tw
        offs.indices.foreach { i =>
          val comp = bytes.slice(offs(i).toInt, (offs(i) + counts(i)).toInt)
          val raw = decompress(comp, h.compression, tw * th * 4)
          val undone = undoPredictor(raw, predictorOf(bb), tw, th)
          val fb = ByteBuffer.wrap(undone).order(ByteOrder.LITTLE_ENDIAN)
          val tx = (i % tilesAcross) * tw; val ty = (i / tilesAcross) * th
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              val gx = tx + x; val gy = ty + y
              if (gx < h.width && gy < h.height)
                out(gy * h.width + gx) = fb.getFloat((y * tw + x) * 4)
              x += 1
            }
            y += 1
          }
        }
      }
      (h, out)
    }
  }

  /** IFD0 as tag -> values, handling classic and BigTIFF layouts. */
  private def parseIfd0(bb: ByteBuffer): Map[Int, IndexedSeq[Long]] =
    parseIfdAt(bb,
      if (bb.getShort(2).toInt == 43) bb.getLong(8)
      else bb.getInt(4).toLong & 0xffffffffL)._1

  /** One IFD (tag -> long values) plus the next-IFD offset. */
  private def parseIfdAt(bb: ByteBuffer, ifdOff: Long): (Map[Int, IndexedSeq[Long]], Long) = {
    val big = bb.getShort(2).toInt == 43
    val n =
      if (big) bb.getLong(ifdOff.toInt).toInt
      else bb.getShort(ifdOff.toInt).toInt & 0xffff
    val entrySize = if (big) 20 else 12
    val entryBase = ifdOff.toInt + (if (big) 8 else 2)
    val inlineMax = if (big) 8 else 4
    val entries = (0 until n).map { i =>
      val base = entryBase + i * entrySize
      val tag = bb.getShort(base).toInt & 0xffff
      val typ = bb.getShort(base + 2).toInt & 0xffff
      val count =
        if (big) bb.getLong(base + 4).toInt else bb.getInt(base + 4)
      val valOff = base + (if (big) 12 else 8)
      val sz = typeSize(typ) * count
      val start =
        if (sz <= inlineMax) valOff
        else if (big) bb.getLong(valOff).toInt else bb.getInt(valOff)
      val vals = (0 until count).map { j =>
        typ match {
          case 3 => bb.getShort(start + j * 2).toLong & 0xffffL
          case 4 => bb.getInt(start + j * 4).toLong & 0xffffffffL
          case 16 | 17 => bb.getLong(start + j * 8)
          case _ => 0L
        }
      }
      tag -> vals
    }.toMap
    val nextAt = entryBase + n * entrySize
    val next =
      if (big) bb.getLong(nextAt)
      else bb.getInt(nextAt).toLong & 0xffffffffL
    (entries, next)
  }

  // ---------------------------------------------------------------------
  // COG range-read contract
  // ---------------------------------------------------------------------

  /** Tile layout of one pyramid level, as locatable from a header prefix. */
  case class LevelLayout(
      width: Int, height: Int, tileWidth: Int, tileHeight: Int,
      compression: Int, predictor: Int,
      tileOffsets: IndexedSeq[Long], tileByteCounts: IndexedSeq[Long])

  /** The COG streaming contract: ONE bounded range request (the first
    * `prefix.length` bytes) must contain the complete IFD chain and every
    * referenced tag array, so a reader can locate any level's tiles —
    * notably the smallest overview — and fetch exactly those byte ranges.
    * Returns one layout per IFD in chain order (head = full image, last =
    * smallest overview). Throws if the prefix is too short, i.e. the file
    * violates header-first layout for this prefix size. */
  /** (resX, resY, xmin, ymax) of the full-resolution image, parsed from
    * the same single bounded header prefix as
    * [[levelLayoutsFromPrefix]] — the geotransform that places a CRS
    * window onto the pixel grid, so a geographic query costs no extra
    * range request. Reads ModelPixelScale (33550) and ModelTiepoint
    * (33922) from IFD0; throws if either is absent or the prefix does
    * not cover their value arrays. */
  def geoTransformFromPrefix(
      prefix: Array[Byte]): (Double, Double, Double, Double) = {
    val bb = ByteBuffer.wrap(prefix).order(ByteOrder.LITTLE_ENDIAN)
    require((bb.get(0) & 0xff) == 0x49 && (bb.get(1) & 0xff) == 0x49,
      "not a little-endian TIFF")
    val big = bb.getShort(2).toInt == 43
    val ifdOff =
      if (big) bb.getLong(8) else bb.getInt(4).toLong & 0xffffffffL
    val inlineMax = if (big) 8 else 4
    val n =
      if (big) bb.getLong(ifdOff.toInt).toInt
      else bb.getShort(ifdOff.toInt).toInt & 0xffff
    val entrySize = if (big) 20 else 12
    val entryBase = ifdOff.toInt + (if (big) 8 else 2)
    def doublesOf(tag: Int): Option[IndexedSeq[Double]] =
      (0 until n).iterator.map { i =>
        val base = entryBase + i * entrySize
        (base,
          bb.getShort(base).toInt & 0xffff,
          bb.getShort(base + 2).toInt & 0xffff,
          if (big) bb.getLong(base + 4).toInt else bb.getInt(base + 4))
      }.collectFirst {
        case (base, t, typ, count) if t == tag && typ == 12 =>
          val valOff = base + (if (big) 12 else 8)
          val start =
            if (8 * count <= inlineMax) valOff
            else if (big) bb.getLong(valOff).toInt else bb.getInt(valOff)
          (0 until count).map(j => bb.getDouble(start + j * 8))
      }
    val scale = doublesOf(TModelPixelScale).getOrElse(
      throw new IllegalArgumentException(
        "no ModelPixelScale in header prefix — not a georeferenced TIFF"))
    val tie = doublesOf(TModelTiepoint).getOrElse(
      throw new IllegalArgumentException(
        "no ModelTiepoint in header prefix — not a georeferenced TIFF"))
    require(scale.length >= 2 && tie.length >= 5,
      s"malformed geo tags: scale=${scale.length}, tiepoint=${tie.length}")
    // A ModelTiepoint anchors raster cell (i, j) at model (x, y) — the
    // anchored PIXEL is not necessarily (0, 0) (legal GeoTIFF; GDAL
    // writes (0,0) but external producers may not). Back the tiepoint
    // out to the raster's top-left corner through the pixel scale:
    // xmin = x - i*resX, ymax = y + j*resY (y grows downward in pixels).
    val (i, j, x, y) = (tie(0), tie(1), tie(3), tie(4))
    (scale(0), scale(1), x - i * scale(0), y + j * scale(1))
  }

  /** The ProjectedCRS EPSG code (GeoKey 3072) from the same bounded
    * header prefix as [[levelLayoutsFromPrefix]] — None when the file
    * carries no GeoKeyDirectory (or no projected-CRS key), so callers
    * can distinguish "unlabelled" from any real code. */
  def epsgFromPrefix(prefix: Array[Byte]): Option[Int] = {
    val bb = ByteBuffer.wrap(prefix).order(ByteOrder.LITTLE_ENDIAN)
    require((bb.get(0) & 0xff) == 0x49 && (bb.get(1) & 0xff) == 0x49,
      "not a little-endian TIFF")
    parseIfd0(bb).get(TGeoKeyDirectory).flatMap { keys =>
      keys.drop(4).grouped(4).collectFirst {
        case IndexedSeq(3072L, _, _, v) => v.toInt
      }
    }
  }

  def levelLayoutsFromPrefix(prefix: Array[Byte]): Seq[LevelLayout] = {
    val bb = ByteBuffer.wrap(prefix).order(ByteOrder.LITTLE_ENDIAN)
    require((bb.get(0) & 0xff) == 0x49 && (bb.get(1) & 0xff) == 0x49,
      "not a little-endian TIFF")
    val big = bb.getShort(2).toInt == 43
    var off = if (big) bb.getLong(8) else bb.getInt(4).toLong & 0xffffffffL
    val out = Seq.newBuilder[LevelLayout]
    try {
      var levels = 0
      while (off != 0 && levels < 64) {
        val (ifd, next) = parseIfdAt(bb, off)
        def gv(t: Int) = ifd.getOrElse(t, IndexedSeq.empty[Long])
        out += LevelLayout(
          gv(TImageWidth).head.toInt, gv(TImageLength).head.toInt,
          gv(TTileWidth).headOption.map(_.toInt).getOrElse(0),
          gv(TTileLength).headOption.map(_.toInt).getOrElse(0),
          gv(TCompression).headOption.map(_.toInt).getOrElse(1),
          gv(TPredictor).headOption.map(_.toInt).getOrElse(1),
          if (ifd.contains(TTileOffsets)) gv(TTileOffsets)
          else gv(TStripOffsets),
          if (ifd.contains(TTileByteCounts)) gv(TTileByteCounts)
          else gv(TStripByteCounts))
        off = next
        levels += 1
      }
    } catch {
      case e: IndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          s"prefix of ${prefix.length} bytes does not cover the IFD chain " +
            "— file is not header-first range-readable at this size", e)
    }
    out.result()
  }

  /** Decode one fetched tile of a level (decompress + undo predictor);
    * returns tileWidth*tileHeight floats (edge tiles include padding). */
  def decodeLevelTile(l: LevelLayout, tileBytes: Array[Byte]): Array[Float] = {
    val raw = decompress(tileBytes, l.compression,
      l.tileWidth * l.tileHeight * 4)
    val undone = undoPredictor(raw, l.predictor, l.tileWidth, l.tileHeight)
    val fb = ByteBuffer.wrap(undone).order(ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(l.tileWidth * l.tileHeight)(i => fb.getFloat(i * 4))
  }

  /** (offsets, byteCounts, tileWidth, tileHeight) of IFD0. */
  private def stripOrTileInfo(bb: ByteBuffer): (IndexedSeq[Long], IndexedSeq[Long], Int, Int) = {
    val ifd = parseIfd0(bb)
    def get(t: Int) = ifd.getOrElse(t, IndexedSeq.empty[Long])
    val offs = if (ifd.contains(TTileOffsets)) get(TTileOffsets)
      else get(TStripOffsets)
    val counts = if (ifd.contains(TTileByteCounts)) get(TTileByteCounts)
      else get(TStripByteCounts)
    (offs, counts,
      get(TTileWidth).headOption.map(_.toInt).getOrElse(0),
      get(TTileLength).headOption.map(_.toInt).getOrElse(0))
  }

  private def predictorOf(bb: ByteBuffer): Int =
    parseIfd0(bb).get(TPredictor).flatMap(_.headOption.map(_.toInt))
      .getOrElse(1)

  // ---------------------------------------------------------------------
  // Compression codecs
  // ---------------------------------------------------------------------

  private[wri] def compress(data: Array[Byte], c: Compression): Array[Byte] = c match {
    case Uncompressed => data
    case Deflate =>
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
      d.setInput(data); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    case Zstd => com.github.luben.zstd.Zstd.compress(data, 9)
    case Lzw => LzwCodec.encode(data)
  }

  private[wri] def decompress(data: Array[Byte], code: Int, expected: Int): Array[Byte] =
    code match {
      case 1 => data
      case 8 | 32946 =>
        val inf = new Inflater()
        inf.setInput(data)
        val out = new Array[Byte](expected)
        var off = 0
        while (!inf.finished() && off < expected)
          off += inf.inflate(out, off, expected - off)
        inf.end(); out
      case 50000 => com.github.luben.zstd.Zstd.decompress(data, expected)
      case 5 => LzwCodec.decode(data, expected)
      case c => throw new IllegalArgumentException(s"compression $c")
    }

  /** TIFF predictors for Float32 samples: 2 = horizontal differencing on
    * the 32-bit sample values, 3 = floating-point byte-split predictor
    * (split float bytes into per-byte planes then diff) — both per the
    * TIFF/GDAL conventions. */
  private[wri] def applyPredictor(raw: Array[Byte], predictor: Int,
      w: Int, h: Int): Array[Byte] = predictor match {
    case 1 => raw
    case 2 =>
      val bb = ByteBuffer.wrap(raw.clone()).order(ByteOrder.LITTLE_ENDIAN)
      val out = ByteBuffer.allocate(raw.length).order(ByteOrder.LITTLE_ENDIAN)
      var y = 0
      while (y < h) {
        var prev = 0
        var x = 0
        while (x < w) {
          val v = bb.getInt((y * w + x) * 4)
          out.putInt((y * w + x) * 4, v - prev); prev = v; x += 1
        }
        y += 1
      }
      out.array()
    case 3 =>
      // byte-split: row of w floats -> 4 planes of w bytes, then
      // horizontal diff over the plane-concatenated row
      val out = new Array[Byte](raw.length)
      var y = 0
      while (y < h) {
        val rowOff = y * w * 4
        var i = 0
        while (i < w) {
          var b = 0
          while (b < 4) {
            // little-endian in memory; planes ordered high byte first
            out(rowOff + b * w + i) = raw(rowOff + i * 4 + (3 - b)); b += 1
          }
          i += 1
        }
        var j = w * 4 - 1
        while (j > 0) {
          out(rowOff + j) = (out(rowOff + j) - out(rowOff + j - 1)).toByte
          j -= 1
        }
        y += 1
      }
      out
    case p => throw new IllegalArgumentException(s"predictor $p")
  }

  private[wri] def undoPredictor(raw: Array[Byte], predictor: Int,
      w: Int, h: Int): Array[Byte] = predictor match {
    case 1 => raw
    case 2 =>
      val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      val out = ByteBuffer.allocate(raw.length).order(ByteOrder.LITTLE_ENDIAN)
      var y = 0
      while (y < h) {
        var acc = 0
        var x = 0
        while (x < w) {
          acc += bb.getInt((y * w + x) * 4)
          out.putInt((y * w + x) * 4, acc); x += 1
        }
        y += 1
      }
      out.array()
    case 3 =>
      val out = new Array[Byte](raw.length)
      val tmp = raw.clone()
      var y = 0
      while (y < h) {
        val rowOff = y * w * 4
        var j = 1
        while (j < w * 4) {
          tmp(rowOff + j) = (tmp(rowOff + j) + tmp(rowOff + j - 1)).toByte
          j += 1
        }
        var i = 0
        while (i < w) {
          var b = 0
          while (b < 4) {
            out(rowOff + i * 4 + (3 - b)) = tmp(rowOff + b * w + i); b += 1
          }
          i += 1
        }
        y += 1
      }
      out
    case p => throw new IllegalArgumentException(s"predictor $p")
  }
}
