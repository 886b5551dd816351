package graft.ingest

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem whose chmod is a pure-JVM call.
  *
  * Without the Hadoop native library (`libhadoop.so` — absent from a
  * plain Spark distribution), `RawLocalFileSystem.setPermission` shells
  * out to `chmod`, forking ONE PROCESS PER CREATED FILE OR DIRECTORY
  * (file create, crc sidecar, mkdir). A wide dynamic-partition write is
  * dominated by those forks: staging 720 hourly directories spends ~9 of
  * 13 seconds in `Shell.runCommand` (measured by stack sampling). This
  * subclass routes permission sets through
  * `java.nio.file.Files.setPosixFilePermissions` — same semantics, no
  * fork — and falls back to the shell path on filesystems without POSIX
  * views. On real clusters (HDFS/object stores, or local fs with
  * libhadoop present) this class is never selected or never hits the
  * shell path, so the production behavior is identical; wire it with
  * `spark.hadoop.fs.file.impl=graft.ingest.NioLocalFileSystem`.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val bits = permission.toShort.toInt
    if ((bits & ~0x1ff) != 0) {
      // sticky/setuid/setgid bits: NIO's POSIX view cannot express
      // them — keep the (forking) shell chmod for this rare shape
      super.setPermission(p, permission)
      return
    }
    val perms = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    val table: Seq[(Int, PosixFilePermission)] = Seq(
      0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
      0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
      0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)
    table.foreach { case (bit, pp) => if ((bits & bit) != 0) perms.add(pp) }
    try java.nio.file.Files.setPosixFilePermissions(
      pathToFile(p).toPath, perms)
    catch {
      case _: UnsupportedOperationException =>
        super.setPermission(p, permission)
    }
  }
}

class NioLocalFileSystem
  extends LocalFileSystem(new NioRawLocalFileSystem)
