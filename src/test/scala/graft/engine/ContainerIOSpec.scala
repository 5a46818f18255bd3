package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI

/** Local filesystem masquerading as an S3-family object store, to assert
  * the commit-protocol CHOICE (no real object store in this sandbox).
  * `create(path, overwrite = false)` fails if the file exists — the same
  * observable contract as S3A's conditional PUT. RawLocal (not the
  * checksumming wrapper) so the scheme override survives path checks.
  */
class FakeS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "fakes3"
  override def getUri: URI = URI.create("fakes3:///")
}

class ContainerIOSpec extends AnyFunSuite {

  private def fakeS3Conf(): Configuration = {
    val c = new Configuration(false)
    c.set("fs.fakes3.impl", classOf[FakeS3FileSystem].getName)
    c.set("fs.file.impl", classOf[LocalFileSystem].getName)
    c
  }

  test("commitProtocol: conditional create on S3-family schemes, rename elsewhere") {
    for (s <- Seq("s3a", "s3", "s3n", "gs", "oss", "cosn"))
      assert(ContainerIO.commitProtocol(s) === ContainerIO.ConditionalCreate, s)
    for (s <- Seq("file", "hdfs", "abfs", "abfss", "viewfs"))
      assert(ContainerIO.commitProtocol(s) === ContainerIO.TmpRename, s)
  }

  test("writeAtomic on an object-store scheme: direct conditional create, no tmp, first commit wins") {
    val conf = fakeS3Conf()
    val dir = java.nio.file.Files.createTempDirectory("graft-fakes3").toString
    val dst = s"fakes3://$dir/part-0.gblk"
    val tmp = s"fakes3://$dir/.part-0.gblk.tmp"
    ContainerIO.writeAtomic(conf, tmp, dst, Array[Byte](1, 2, 3))
    // no tmp file was ever created (S3 path writes the final key directly)
    assert(!new java.io.File(s"$dir/.part-0.gblk.tmp").exists,
      "object-store commit must not use a tmp+rename")
    assert(ContainerIO.readAll(conf, dst).toSeq === Seq[Byte](1, 2, 3))
    // a second attempt (identical bytes re-encoded) loses the race quietly
    ContainerIO.writeAtomic(conf, tmp, dst, Array[Byte](1, 2, 3))
    assert(ContainerIO.readAll(conf, dst).toSeq === Seq[Byte](1, 2, 3))
  }

  test("writeAtomic on a rename-atomic scheme still goes through tmp+rename") {
    val conf = new Configuration()
    val dir = java.nio.file.Files.createTempDirectory("graft-local").toString
    val dst = s"file:$dir/part-0.gblk"
    val tmp = s"file:$dir/.part-0.gblk.tmp"
    ContainerIO.writeAtomic(conf, tmp, dst, Array[Byte](7, 8))
    assert(ContainerIO.readAll(conf, dst).toSeq === Seq[Byte](7, 8))
    assert(!new java.io.File(s"$dir/.part-0.gblk.tmp").exists,
      "tmp must be renamed away")
  }
}
