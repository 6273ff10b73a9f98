package graft.wri

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Bounded byte-range access to one raster — the COG client contract
  * (`/root/reference/README.md:329-335`: COGs exist so clients stream
  * sub-windows via range requests instead of downloading files). Every
  * [[CogQuery]] read goes through this seam, so the same window code
  * serves local disk, HDFS/S3 (Hadoop schemes), and plain HTTP range
  * requests — the reference's actual serving mode.
  *
  * Implementations must be cheap to construct per file (one open per
  * layer task) and are used single-threaded within a task.
  */
trait RangeReader extends AutoCloseable {
  /** Total byte length of the object. */
  def length: Long
  /** Read exactly `buf.length` bytes starting at `offset`. */
  def readFully(offset: Long, buf: Array[Byte]): Unit
}

object RangeReader {

  /** Reader for `url` — `http(s)://` goes over HTTP Range requests,
    * everything else resolves through the Hadoop [[Path]] machinery
    * (`file://`, bare paths, `hdfs://`, any registered scheme). */
  def open(url: String, conf: Configuration): RangeReader =
    if (url.startsWith("http://") || url.startsWith("https://"))
      new HttpRangeReader(url)
    else new HadoopRangeReader(url, conf)
}

/** Positioned reads through the Hadoop FileSystem API —
  * `FSDataInputStream.readFully(pos, buf)` is the seek+readFully range
  * contract, and on HDFS it reads only the blocks the range touches. */
final class HadoopRangeReader(url: String, conf: Configuration)
    extends RangeReader {
  private val path = new Path(url)
  private val fs = path.getFileSystem(conf)
  val length: Long = fs.getFileStatus(path).getLen
  private val in = fs.open(path)
  def readFully(offset: Long, buf: Array[Byte]): Unit =
    in.readFully(offset, buf)
  def close(): Unit = in.close()
}

/** HTTP Range-request reader — the COG serving mode the reference's
  * hosted catalog assumes: `HEAD` for the length, then one
  * `Range: bytes=a-b` GET per requested range (header prefix + each
  * tile). A server that ignores Range (responds 200 with the full
  * body) is rejected loudly rather than silently downloading whole
  * rasters — the economy IS the contract. */
final class HttpRangeReader(url: String) extends RangeReader {
  private def connect(range: Option[(Long, Long)]) = {
    val c = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setConnectTimeout(10000)
    c.setReadTimeout(60000)
    range.foreach { case (a, b) =>
      c.setRequestProperty("Range", s"bytes=$a-$b")
    }
    c
  }

  val length: Long = {
    val c = connect(None)
    c.setRequestMethod("HEAD")
    try {
      require(c.getResponseCode == 200, s"HEAD $url -> ${c.getResponseCode}")
      val len = c.getContentLengthLong
      require(len >= 0, s"HEAD $url returned no Content-Length")
      len
    } finally c.disconnect()
  }

  def readFully(offset: Long, buf: Array[Byte]): Unit = {
    if (buf.length == 0) return
    val c = connect(Some((offset, offset + buf.length - 1)))
    try {
      require(c.getResponseCode == 206,
        s"GET $url range $offset+${buf.length} -> ${c.getResponseCode} " +
          "(server does not honor Range requests)")
      val in = c.getInputStream
      try {
        var off = 0
        while (off < buf.length) {
          val n = in.read(buf, off, buf.length - off)
          require(n >= 0, s"short range read from $url at $offset")
          off += n
        }
      } finally in.close()
    } finally c.disconnect()
  }

  def close(): Unit = ()
}
