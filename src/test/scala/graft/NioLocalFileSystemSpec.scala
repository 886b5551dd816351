package graft

import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class NioLocalFileSystemSpec extends AnyFunSuite {

  private def freshFs(): FileSystem = {
    val conf = new Configuration()
    conf.set("fs.file.impl", "graft.ingest.NioLocalFileSystem")
    conf.setBoolean("fs.file.impl.disable.cache", true)
    FileSystem.get(new java.net.URI("file:///"), conf)
  }

  test("fs.file.impl resolves to the nio local fs") {
    val fs = freshFs()
    assert(fs.isInstanceOf[graft.ingest.NioLocalFileSystem])
    assert(fs.getScheme == "file")
  }

  test("setPermission applies exact posix bits without a fork") {
    val fs = freshFs()
    val dir = java.nio.file.Files.createTempDirectory("niofs_")
    val f = new Path(dir.toString, "a.txt")
    val out = fs.create(f)
    out.write(42); out.close()
    fs.setPermission(f, new FsPermission("644"))
    val got = java.nio.file.Files
      .getPosixFilePermissions(java.nio.file.Paths.get(f.toUri.getPath))
      .asScala
    assert(got == Set(OWNER_READ, OWNER_WRITE, GROUP_READ, OTHERS_READ))
    fs.setPermission(f, new FsPermission("750"))
    val got2 = java.nio.file.Files
      .getPosixFilePermissions(java.nio.file.Paths.get(f.toUri.getPath))
      .asScala
    assert(got2 == Set(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
      GROUP_READ, GROUP_EXECUTE))
  }

  test("create/mkdirs/rename/list round-trip matches the stock local fs") {
    val fs = freshFs()
    val root = java.nio.file.Files.createTempDirectory("niofs_rt_")
    val sub = new Path(root.toString, "x=1/y=2")
    assert(fs.mkdirs(sub))
    val f = new Path(sub, "part-0.bin")
    val out = fs.create(f)
    out.write(Array.fill(16)(7.toByte)); out.close()
    assert(fs.getFileStatus(f).getLen == 16L)
    val moved = new Path(sub, "part-1.bin")
    assert(fs.rename(f, moved))
    val listed = fs.listStatus(sub).map(_.getPath.getName).toSet
    // the checksum sidecar rides along exactly like the stock local fs
    assert(listed.contains("part-1.bin"))
    assert(fs.open(moved).readByte() == 7.toByte)
  }
}
