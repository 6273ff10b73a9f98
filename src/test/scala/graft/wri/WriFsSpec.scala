package graft.wri

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem that records every file CREATE, under a scheme the
  * static object-store allowlist does not know (the cos/obs/tos/lakefs
  * shape ADVICE flagged). The tmp sibling a rename-path
  * [[WriFs.atomicWriteString]] writes is observable here: the direct-PUT
  * path creates exactly ONE file, the fallback creates the tmp first. */
class RecStubFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "recstub"
  override def getUri: java.net.URI = java.net.URI.create("recstub:///")
  // the exact overload atomicWriteString calls — the deeper multi-arg
  // overloads are not reliably on RawLocalFileSystem's internal path
  override def create(f: Path, overwrite: Boolean): FSDataOutputStream = {
    RecStubFileSystem.created += f.toUri.getPath
    super.create(f, overwrite)
  }
}

object RecStubFileSystem {
  val created = scala.collection.mutable.Buffer.empty[String]
}

/** Same stub under a second scheme, SELF-REPORTING eventual-consistency
  * directory semantics through the Hadoop path-capability API. That
  * capability witnesses LISTING consistency, not atomic single-PUT
  * create — so it must NOT flip the marker replace onto the direct-PUT
  * path (a store could report it while its create is not atomic). */
class CapStubFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "capstub"
  override def getUri: java.net.URI = java.net.URI.create("capstub:///")
  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability == "fs.capability.directory.listing.inconsistent" ||
      super.hasPathCapability(path, capability)
  override def create(f: Path, overwrite: Boolean): FSDataOutputStream = {
    CapStubFileSystem.created += f.toUri.getPath
    super.create(f, overwrite)
  }
}

object CapStubFileSystem {
  val created = scala.collection.mutable.Buffer.empty[String]
}

/** The object-store classification must be EXTENSIBLE: the static scheme
  * allowlist cannot name every store, and a miss routes the atomic
  * marker replace through a rename that is copy+delete on exactly those
  * stores. Deployments extend it by configuration
  * ([[WriFs.ObjectStoreSchemesKey]]) or the filesystem self-reports via
  * the path-capability probe. */
class WriFsSpec extends AnyFunSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("wrifs").toString

  test("an unlisted scheme declared via graft.fs.objectstore.schemes " +
      "takes the direct single-PUT — no tmp sibling is ever created") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.recstub.impl", classOf[RecStubFileSystem].getName)
    val root = tmpDir()
    val target = new Path(s"recstub://$root/_marker")

    // without the extension the scheme is unknown: the rename path is
    // attempted (no AbstractFileSystem binding -> fallback), and the tmp
    // sibling IS created first — on a real unlisted object store that
    // fallback only engages after the unsafe-rename risk already exists
    RecStubFileSystem.created.clear()
    WriFs.atomicWriteString(WriFs.fs(target.toString, conf), target, "a #\n")
    assert(RecStubFileSystem.created.exists(_.endsWith("_marker.tmp")),
      "premise broken: the unlisted scheme no longer writes a tmp " +
        "sibling, so the extension has nothing to prove")

    // with the extension: ONE create, the target itself, no tmp
    conf.set(WriFs.ObjectStoreSchemesKey, "recstub")
    val fs2 = org.apache.hadoop.fs.FileSystem.newInstance(
      target.toUri, conf)
    RecStubFileSystem.created.clear()
    WriFs.atomicWriteString(fs2, target, "b #\n")
    assert(RecStubFileSystem.created.forall(!_.endsWith(".tmp")),
      s"extended scheme still wrote a tmp: ${RecStubFileSystem.created}")
    assert(RecStubFileSystem.created.exists(_.endsWith("_marker")),
      "no create recorded at all — the stub is inert")
    val content = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/_marker"))
    assert(content == "b #\n", s"content drifted: '$content'")
  }

  test("a listing-inconsistency capability self-report does NOT flip " +
      "the replace onto the direct PUT — PUT atomicity is a deployment " +
      "statement, not inferable from listing semantics") {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.capstub.impl", classOf[CapStubFileSystem].getName)
    val root = tmpDir()
    val target = new Path(s"capstub://$root/_marker")
    CapStubFileSystem.created.clear()
    WriFs.atomicWriteString(WriFs.fs(target.toString, conf), target, "c #\n")
    assert(CapStubFileSystem.created.exists(_.endsWith("_marker.tmp")),
      "the capability self-report rerouted the replace to the direct " +
        "PUT — a store whose create is not atomic would get a strictly " +
        "weaker replace")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/_marker")) == "c #\n")
  }
}
