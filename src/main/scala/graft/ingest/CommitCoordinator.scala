package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}

/** The LogStore seam (Delta's `LogStore` contract, made a real
  * interface): ONE atomic primitive — publish a prepared manifest as a
  * committed version file IF AND ONLY IF that version slot is free —
  * carries the whole commit protocol's correctness. Everything else in
  * [[ManifestSink]] (staging, write-ahead manifests, snapshot cuts,
  * recovery) is ordinary file IO; only this claim must be atomic
  * across WRITERS IN DIFFERENT PROCESSES.
  *
  * Contract for an implementation:
  *  - `putIfAbsent(fs, tmp, fin)` must atomically make `fin` exist
  *    with `tmp`'s content and return true, OR return false leaving
  *    `fin` untouched — never a partial/overwritten `fin`. On success
  *    `tmp` is consumed (deleted/renamed); on failure `tmp` MUST
  *    survive, because callers retry the claim at the next version
  *    number with the same tmp file.
  *  - Two coordinators (two JVMs, two hosts) claiming the same `fin`
  *    concurrently: exactly one wins.
  *
  * Deployment matrix:
  *  - HDFS: `rename` fails-if-exists — [[FsCommitCoordinator]] as-is.
  *  - Local FS (tests, single-node): POSIX rename OVERWRITES, so the
  *    default routes through `CREATE_NEW` — a genuinely atomic
  *    create-if-absent (open(O_CREAT|O_EXCL)) — making two coordinator
  *    INSTANCES on one box behave exactly like two processes.
  *  - Object stores (GCS/S3): implement with the store's conditional
  *    put — GCS `ifGenerationMatch(0)`, S3 `If-None-Match: *` — and
  *    inject via [[ManifestSink.coordinator]]. This file IS the
  *    interface that comment used to be.
  */
trait CommitCoordinator {

  /** Atomically publish `tmp` as `fin` iff `fin` does not exist.
    * True = this writer owns the version. False = slot taken; `tmp`
    * still exists for the caller's retry.
    */
  def putIfAbsent(fs: FileSystem, tmp: Path, fin: Path): Boolean
}

/** Default coordinator: HDFS rename-fails-if-exists semantics, with a
  * local-filesystem fast path through `CREATE_NEW` (POSIX
  * `O_CREAT|O_EXCL`) because the local rename(2) silently OVERWRITES —
  * an exists-then-rename pair would leave a cross-process race window.
  * Manifest files are KB-sized, so the local byte copy is free.
  */
final class FsCommitCoordinator extends CommitCoordinator {

  override def putIfAbsent(fs: FileSystem, tmp: Path,
      fin: Path): Boolean =
    if (fs.getScheme == "file") {
      val tmpNio = java.nio.file.Paths.get(
        fs.makeQualified(tmp).toUri.getPath)
      val finNio = java.nio.file.Paths.get(
        fs.makeQualified(fin).toUri.getPath)
      // Claim the slot with a HARD LINK: link(2) is atomic, fails with
      // EEXIST if the slot is taken, and — critically — `fin` appears
      // with `tmp`'s COMPLETE content in one step. A CREATE_NEW byte
      // copy claims atomically but fills `fin` incrementally, so a
      // concurrent reader (readers hold no lock) could parse a
      // truncated manifest, miss target lines, and commit a snapshot
      // without them — silent data loss once vacuum runs. Manifests
      // can be MBs (base64 bloom lines), so that torn-read window is
      // real, not theoretical.
      try {
        java.nio.file.Files.createLink(finNio, tmpNio)
        java.nio.file.Files.delete(tmpNio)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException |
            _: java.nio.file.FileSystemException =>
          // FS without hard links (rare for scheme=file; surfaces as
          // either exception type depending on the mount): degrade to
          // the CREATE_NEW byte copy — still an atomic CLAIM
          // (open(O_CREAT|O_EXCL)), re-opening the (tiny on such FSs)
          // torn-read window as the best available trade.
          try {
            val bytes = java.nio.file.Files.readAllBytes(tmpNio)
            java.nio.file.Files.write(finNio, bytes,
              java.nio.file.StandardOpenOption.CREATE_NEW)
            java.nio.file.Files.delete(tmpNio)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
      }
    } else {
      // HDFS contract: rename to an existing destination FAILS (returns
      // false) atomically — exactly the putIfAbsent we need
      !fs.exists(fin) && fs.rename(tmp, fin)
    }
}
