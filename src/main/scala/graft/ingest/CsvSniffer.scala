package graft.ingest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Bounded-I/O CSV header sniffing.
  *
  * The reference reads at most 4 000 bytes of a file to discover its header
  * row (BucketToBigQuery.js:124–130 `getLines`; commands/
  * GetStorageToBuffer.js ranged read), splits on any newline convention,
  * takes line 0, splits on commas and strips surrounding double quotes
  * (BucketToBigQuery.js:132–140). We reproduce that contract through the
  * Hadoop FileSystem API, which covers local, HDFS, s3a and gs paths alike —
  * a 4 KB ranged read per file regardless of file size, so sniffing N files
  * is O(N) metadata work, never a data scan.
  */
object CsvSniffer {

  val DefaultSniffBytes = 4000

  /** Read up to `maxBytes` from the head of the file. */
  def readHead(conf: Configuration, uri: String,
               maxBytes: Int = DefaultSniffBytes): String = {
    val path = new Path(uri)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](maxBytes)
      var off = 0
      var n = 0
      while (off < maxBytes && { n = in.read(buf, off, maxBytes - off); n > 0 })
        off += n
      new String(buf, 0, off, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Split head text into lines on \r\n, \r or \n
    * (reference regex BucketToBigQuery.js:128).
    */
  def lines(head: String): Seq[String] =
    head.split("\r\n|\r|\n", -1).toSeq

  /** Header cells of line 0, quotes stripped (BucketToBigQuery.js:132–140). */
  def sniffHeaders(head: String): Seq[String] = {
    val first = lines(head).headOption.getOrElse("")
    if (first.isEmpty) Nil
    else first.split(",", -1).toSeq
      .map(_.replaceAll("^\"|\"$", "").trim)
  }

  def sniffFile(conf: Configuration, uri: String): Seq[String] =
    sniffHeaders(readHead(conf, uri))

  /** The reference sniffs the FIRST sniffable file (forward scan,
    * BucketToBigQuery.js:257–266) and the LAST (backward scan, :271–281)
    * and keeps whichever header list is longer (:282) — sound because
    * columns only ever grow rightward. We keep that two-probe strategy: at
    * 100 TB it means 2 ranged reads per batch, not one per file.
    */
  def longestHeaders(conf: Configuration, uris: Seq[String]): Seq[String] = {
    val forward = uris.iterator.map(u => sniffFile(conf, u))
      .find(_.nonEmpty).getOrElse(Nil)
    val backward = uris.reverseIterator.map(u => sniffFile(conf, u))
      .find(_.nonEmpty).getOrElse(Nil)
    if (forward.length >= backward.length) forward else backward
  }
}
