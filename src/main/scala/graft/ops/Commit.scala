package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE commit-marker protocol shared by the three disk-backed stores
  * — [[VectorStore]]'s `_current` pointer + `#<count>` ledgers,
  * [[DedupIndex]]'s `_folded` coverage marker, and [[Assembly]]'s
  * `_committed_vN` versioned manifests. Each store used to hand-roll the
  * same read / atomic-replace / resolve-max trio; the crash-window audit
  * surface was triplicated, and round-10's ADVICE #1 was exactly a
  * divergence between two of the copies. The call sites are now thin
  * adapters over this helper.
  *
  * The protocol's invariants, in one place:
  *  - A marker is REPLACED atomically under the filesystem's own
  *    semantics ([[graft.wri.WriFs.atomicWriteString]]: object stores
  *    take the single PUT their stores make atomic; rename-capable
  *    filesystems take a sibling tmp + FileContext overwrite-rename).
  *  - Content carries a caller-defined completeness witness (a trailing
  *    `#` token, a `#<count>` sentinel line) so a filesystem that broke
  *    the atomic contract yields a marker that fails validation LOUDLY
  *    instead of parsing truncated content as smaller, wrong state.
  *  - A torn marker may still be recoverable: the rename path's sibling
  *    `<name>.tmp` (or the PUT fallback's pre-write of the same file)
  *    holds the intended content — [[read]] classifies the four states
  *    so callers heal (re-replace from the recovered content), serve
  *    read-only with a WARN, or refuse, per their own policy.
  *  - Create-once versioned markers (`<prefix>N` files, created AFTER
  *    their payload is fully written) commit by existence; readers
  *    resolve the max N, so a crash at any point leaves the previous
  *    complete version in place.
  */
object Commit {

  /** Read a small control-plane file fully (markers, pointers, ledgers
    * — never data). */
  def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(0L, bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
  }

  def readOpt(fs: FileSystem, p: Path): Option[String] =
    if (fs.exists(p)) Some(readSmall(fs, p)) else None

  /** Atomic replace — the single write primitive every marker goes
    * through (scheme-aware; see [[graft.wri.WriFs.atomicWriteString]]). */
  def replace(fs: FileSystem, p: Path, content: String): Unit =
    graft.wri.WriFs.atomicWriteString(fs, p, content)

  /** Classification of a marker read against its completeness witness. */
  sealed trait Marker
  /** No marker at all — the store has never committed this state. */
  case object Absent extends Marker
  /** Marker present and complete. */
  final case class Intact(text: String) extends Marker
  /** Marker torn, but the replace's sibling tmp holds the complete
    * intended content (a crash inside the PUT fallback, which writes
    * the tmp first): the state is recoverable — a read-write caller
    * re-replaces the marker, a read-only caller may serve the recovered
    * view with a WARN. */
  final case class Recovered(text: String) extends Marker
  /** Marker torn and nothing recoverable — the previous content was
    * already overwritten and the new one never landed complete. Callers
    * must refuse loudly; the coverage cannot be reconstructed. */
  case object Lost extends Marker

  /** Repair a marker classified [[Recovered]]: write the MAIN file
    * directly, never touching the sibling tmp — the tmp is the ONLY
    * durable copy of the recovered content, and routing the repair
    * through [[replace]] would truncate it first (its fallback path
    * recreates the tmp), so a crash mid-repair would downgrade a
    * recoverable store to permanently [[Lost]]. A crash mid-heal here
    * leaves a torn main + intact tmp: still Recovered, retryable.
    * MUST be called only from a store's single-maintenance-process verb
    * (a compact): a blind re-replace from a serving verb could race a
    * concurrent maintenance commit and clobber its NEWER marker with
    * the recovered OLD content. */
  def heal(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Read marker `p`, validating with `isComplete`; a torn main file
    * falls back to the sibling `<name>.tmp` left by a crashed
    * [[replace]]. A complete tmp next to an INTACT main is ignored (it
    * is either the same content — a crash between the fallback PUT and
    * its tmp cleanup — or an older replace's leftover; the main file is
    * always the truth once complete). */
  def read(fs: FileSystem, p: Path, isComplete: String => Boolean): Marker =
    readOpt(fs, p) match {
      case None => Absent
      case Some(text) if isComplete(text) => Intact(text)
      case Some(_) =>
        readOpt(fs, new Path(p.getParent, p.getName + ".tmp")) match {
          case Some(tmp) if isComplete(tmp) => Recovered(tmp)
          case _ => Lost
        }
    }

  /** All numeric versions of `<prefix>N` marker files under `dir`.
    * Non-numeric suffixes (a tool's `._COPYING_` temp, an editor
    * backup) are ignored rather than crashing every entry point. */
  def versions(fs: FileSystem, dir: String, prefix: String): Seq[Long] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix))
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong)
      .toSeq
  }

  /** Highest committed version among `<prefix>N` markers — the resolve
    * step of the create-once versioned commit. */
  def maxVersion(fs: FileSystem, dir: String, prefix: String): Option[Long] =
    versions(fs, dir, prefix).maxOption

  /** Write id lines closed by the `#<count>` sentinel (the ledger
    * format): torn writes fail [[readSealedIds]] loudly instead of
    * parsing a truncated trailing id as a smaller, wrong id. */
  def writeSealedIds(fs: FileSystem, p: Path, ids: Set[Long]): Unit = {
    val all = ids.toSeq.sorted
    replace(fs, p,
      all.map(_.toString).mkString("", "\n", "\n") + s"#${all.size}\n")
  }

  /** Read a `#<count>`-sealed id file; absent = empty set; torn = throw. */
  def readSealedIds(fs: FileSystem, p: Path): Set[Long] = {
    if (!fs.exists(p)) return Set.empty
    val lines = readSmall(fs, p).split("\n").filter(_.nonEmpty)
    val ids = lines.takeWhile(!_.startsWith("#")).map(_.toLong).toSet
    require(lines.lastOption.contains(s"#${ids.size}"),
      s"corrupt ledger $p: missing or mismatched '#<count>' sentinel")
    ids
  }
}
