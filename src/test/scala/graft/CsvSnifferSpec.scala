package graft

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.CsvSniffer

class CsvSnifferSpec extends AnyFunSuite {

  test("lines split on all three newline conventions") {
    assert(CsvSniffer.lines("a\r\nb\rc\nd") == Seq("a", "b", "c", "d"))
  }

  test("sniffHeaders strips surrounding quotes per cell") {
    assert(CsvSniffer.sniffHeaders("\"ts\",v1,\"v 2\"\n1,2,3") ==
      Seq("ts", "v1", "v 2"))
    assert(CsvSniffer.sniffHeaders("") == Nil)
  }

  test("readHead is bounded I/O (4KB default) and longestHeaders two-probes") {
    val dir = java.nio.file.Files.createTempDirectory("sniff_").toFile
    def write(name: String, body: String): String = {
      val f = new java.io.File(dir, name)
      val w = new java.io.PrintWriter(f)
      try w.write(body) finally w.close()
      f.getAbsolutePath
    }
    val narrow = write("a.csv", "ts,v1\n" + ("1,2\n" * 5000)) // > 4KB file
    val wide = write("b.csv", "ts,v1,v2\n1,2,3\n")
    val conf = new Configuration()
    assert(CsvSniffer.readHead(conf, narrow).length <= CsvSniffer.DefaultSniffBytes)
    assert(CsvSniffer.sniffFile(conf, narrow) == Seq("ts", "v1"))
    // longest of first/last wins regardless of order
    assert(CsvSniffer.longestHeaders(conf, Seq(narrow, wide)) ==
      Seq("ts", "v1", "v2"))
    assert(CsvSniffer.longestHeaders(conf, Seq(wide, narrow)) ==
      Seq("ts", "v1", "v2"))
  }
}
