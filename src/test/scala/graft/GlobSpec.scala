package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Glob

class GlobSpec extends AnyFunSuite {

  test("** crosses directory boundaries (reference minimatch semantics)") {
    assert(Glob.matches("**/sensors/**/*.csv", "a/b/sensors/2026/01/x.csv"))
    assert(Glob.matches("**/sensors/**/*.csv", "sensors/x.csv"))
    assert(!Glob.matches("**/sensors/**/*.csv", "a/b/other/x.csv"))
  }

  test("* and ? stay within one segment") {
    assert(Glob.matches("data/*.csv", "data/file.csv"))
    assert(!Glob.matches("data/*.csv", "data/sub/file.csv"))
    assert(Glob.matches("f?.csv", "f1.csv"))
    assert(!Glob.matches("f?.csv", "f12.csv"))
    assert(!Glob.matches("f?.csv", "f/.csv"))
  }

  test("{a,b} alternation") {
    assert(Glob.matches("logs/{app,sys}/*.log", "logs/app/x.log"))
    assert(Glob.matches("logs/{app,sys}/*.log", "logs/sys/y.log"))
    assert(!Glob.matches("logs/{app,sys}/*.log", "logs/db/y.log"))
  }

  test("literal dots and regex metacharacters are quoted") {
    assert(Glob.matches("a.b/*.csv", "a.b/x.csv"))
    assert(!Glob.matches("a.b/*.csv", "aXb/x.csv"))
    assert(Glob.matches("a+b/?.csv", "a+b/1.csv"))
  }

  test("matchesAny is the reference _.some over task sources") {
    val globs = Seq("**/*.csv", "**/*.tsv")
    assert(Glob.matchesAny(globs, "x/y.tsv"))
    assert(!Glob.matchesAny(globs, "x/y.json"))
    assert(!Glob.matchesAny(Nil, "x/y.csv"))
  }
}
