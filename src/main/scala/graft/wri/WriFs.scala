package graft.wri

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFileSystem, FileSystem, Path}
import org.apache.spark.SerializableWritable
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** Scheme-agnostic filesystem plumbing for the WRI pipeline stages.
  *
  * The reference's rasters are served remotely (`README.md:329-335`), and
  * at 100 TB the inventory/COG/STAC stages are exactly the jobs that must
  * run where the data lives — so every sink and every existence/size/list
  * touch in stages 00/01/02 resolves the Hadoop [[FileSystem]] from the
  * path's OWN scheme (`file://`, `hdfs://`, any registered scheme)
  * instead of assuming the driver's local POSIX disk. Raster READS go
  * through [[RangeReader]] (which adds plain-HTTP range requests on top
  * of the Hadoop schemes); this object carries the write/metadata side.
  */
object WriFs {

  /** Hadoop FileSystem for `path`'s own scheme. The local
    * ChecksumFileSystem is unwrapped to its raw form so local sinks
    * produce the same bytes-on-disk trees as before (no `.crc`
    * sidecars next to COGs or STAC JSON); HDFS and object-store
    * filesystems pass through untouched. */
  def fs(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf) match {
      case c: ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }

  /** The session's Hadoop configuration as an executor-shippable
    * broadcast (Configuration itself is Writable but not Serializable),
    * so scheme credentials/settings resolve on executors too. */
  def confBroadcast(
      spark: SparkSession): Broadcast[SerializableWritable[Configuration]] =
    spark.sparkContext.broadcast(new SerializableWritable(
      new Configuration(spark.sparkContext.hadoopConfiguration)))

  /** Default configuration for non-Spark call sites (tests, local
    * tools): bare paths resolve against the default local filesystem. */
  lazy val defaultConf: Configuration = new Configuration()

  def mkdirs(dir: String, conf: Configuration): Unit = {
    fs(dir, conf).mkdirs(new Path(dir)); ()
  }

  def exists(p: String, conf: Configuration): Boolean =
    fs(p, conf).exists(new Path(p))

  def size(p: String, conf: Configuration): Long =
    fs(p, conf).getFileStatus(new Path(p)).getLen

  /** Child names under `dir` (empty if the directory does not exist). */
  def listNames(dir: String, conf: Configuration): Seq[String] = {
    val f = fs(dir, conf)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName).toSeq
  }

  def create(p: String, conf: Configuration): java.io.OutputStream =
    fs(p, conf).create(new Path(p), true)

  def writeString(p: String, s: String, conf: Configuration): Unit = {
    val out = create(p, conf)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** Read a small control/document file fully (STAC JSON, markers —
    * never data files). */
  def readString(p: String, conf: Configuration): String = {
    val f = fs(p, conf)
    val path = new Path(p)
    val bytes = new Array[Byte](f.getFileStatus(path).getLen.toInt)
    val in = f.open(path)
    try in.readFully(0L, bytes) finally in.close()
    new String(bytes, "UTF-8")
  }

  /** Schemes whose rename is a non-atomic copy+delete but whose
    * single-PUT create-overwrite IS atomic — object stores.
    * [[atomicWriteString]] must not take the FileContext rename path on
    * these: Hadoop ships AbstractFileSystem bindings for several of them
    * (e.g. `org.apache.hadoop.fs.s3a.S3A`), so an
    * UnsupportedFileSystemException fallback alone would route exactly
    * the stores the rename is unsafe on THROUGH the rename. */
  private val ObjectStoreSchemes = Set(
    "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss",
    "cosn", "swift", "o3fs", "ofs")

  /** Hadoop configuration key extending [[ObjectStoreSchemes]]: a
    * comma-separated list of additional schemes to treat as
    * object-store-like. The static allowlist cannot name every store
    * (cos, obs, tos, lakefs, a viewfs wrapper routing to s3a, vendor
    * forks) and a miss routes the marker replace through the
    * FileContext rename — on such stores the non-atomic copy+delete
    * this helper exists to avoid. Deployments extend the set with
    * `--conf spark.hadoop.graft.fs.objectstore.schemes=cos,obs`. */
  val ObjectStoreSchemesKey = "graft.fs.objectstore.schemes"

  /** Treat `fs` as an object store when its scheme is in the static
    * allowlist or the [[ObjectStoreSchemesKey]] extension. Deliberately
    * NO path-capability probe: the probeable capabilities (e.g.
    * `fs.capability.directory.listing.inconsistent`) witness listing
    * consistency, not atomic single-PUT create — routing a store onto
    * the direct-PUT path on that evidence could hand a filesystem whose
    * create is NOT atomic a strictly weaker replace than the tmp+rename
    * it would otherwise get. The classification is a statement about
    * PUT atomicity, and only the deployment can make it. */
  private def isObjectStore(fs: FileSystem, scheme: String): Boolean =
    ObjectStoreSchemes.contains(scheme) ||
      fs.getConf.getTrimmedStrings(ObjectStoreSchemesKey)
        .exists(_.toLowerCase(java.util.Locale.ROOT) == scheme)

  /** Replace `path` with `content` ATOMICALLY under the target
    * filesystem's own semantics, so a concurrent reader sees the old
    * complete file or the new complete file — never a missing or torn
    * one. Object-store schemes write the file directly (one PUT, which
    * those stores make atomic; their rename is copy+delete and must be
    * avoided). Everything else writes a sibling tmp then a FileContext
    * overwrite-rename — atomic on HDFS and local filesystems (the plain
    * FileSystem.rename cannot overwrite, and delete-then-rename opens
    * exactly the unsafe gap this helper exists to close). Filesystems
    * with no FileContext binding fall back to the direct
    * create-overwrite, the strongest primitive such a filesystem
    * offers. */
  def atomicWriteString(fs: FileSystem, path: Path, content: String): Unit = {
    def put(): Unit = {
      val out = fs.create(path, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    val scheme = Option(fs.getUri.getScheme)
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("file")
    if (isObjectStore(fs, scheme)) put()
    else {
      val tmp = new Path(path.getParent, path.getName + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          fs.getUri, fs.getConf)
        fc.rename(tmp, path, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          put(); fs.delete(tmp, false); ()
      }
    }
  }
}
