package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.schema.SchemaEvolution._

class SchemaEvolutionSpec extends AnyFunSuite {

  private def st(names: String*): StructType =
    StructType(names.map(n => StructField(n, DoubleType, nullable = true)))

  test("prefixCompatible truth table (reference sameOrSuperSet)") {
    assert(prefixCompatible(Seq("a", "b"), Seq("a", "b")))
    assert(prefixCompatible(Seq("a", "b", "c"), Seq("a", "b")))
    assert(prefixCompatible(Seq("a"), Seq("a", "b")))
    assert(prefixCompatible(Nil, Seq("a")))
    assert(!prefixCompatible(Seq("a", "x"), Seq("a", "b")))
    assert(!prefixCompatible(Seq("b", "a"), Seq("a", "b"))) // order matters
  }

  test("expand right-appends new columns as nullable double") {
    val out = expand(st("ts", "v1"), Seq("ts", "v1", "v2", "v3"))
    assert(out.fields.map(_.name).toSeq == Seq("ts", "v1", "v2", "v3"))
    assert(out.fields.drop(2).forall(f => f.dataType == DoubleType && f.nullable))
  }

  test("expand keeps existing types when incoming is narrower or equal") {
    val existing = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", DoubleType)))
    assert(expand(existing, Seq("ts")) == existing)
    assert(expand(existing, Seq("ts", "v")) == existing)
  }

  test("expand rejects non-prefix headers") {
    intercept[SchemaMismatchException] {
      expand(st("a", "b"), Seq("a", "x"))
    }
  }

  test("likelyTimestamp normalization (reference quirk fixed: strip ALL separators)") {
    assert(likelyTimestamp("timestamp"))
    assert(likelyTimestamp("Created_At"))
    assert(likelyTimestamp("created-at"))
    assert(likelyTimestamp("Date Time")) // two separators — needs global strip
    assert(!likelyTimestamp("temperature"))
    assert(!likelyTimestamp("updated_at"))
  }

  private def ts(names: String*): StructType =
    StructType(names.map(n => StructField(n, TimestampType, nullable = true)))

  test("inferPartitionField only scans the first 5 fields") {
    assert(inferPartitionField(ts("a", "b", "time")).contains("time"))
    assert(inferPartitionField(
      ts("a", "b", "c", "d", "e", "timestamp")).isEmpty)
  }

  test("inferPartitionField is type-restricted: a float column named like " +
      "a timestamp never partitions (sniffed-only tables load unpartitioned)") {
    // st() types everything double — the all-sniffed case; the old behavior
    // picked "timestamp" by name and failed to_date(DOUBLE) at load time
    assert(inferPartitionField(st("timestamp", "v")).isEmpty)
    assert(inferPartitionField(StructType(Seq(
      StructField("created_at", DateType),
      StructField("v", DoubleType)))).contains("created_at"))
  }

  test("effectivePartitionField: explicit wins, explicit null disables") {
    val s = ts("timestamp", "v")
    assert(effectivePartitionField(Some("v"), explicitlySet = true, s)
      .contains("v"))
    assert(effectivePartitionField(None, explicitlySet = true, s).isEmpty)
    assert(effectivePartitionField(None, explicitlySet = false, s)
      .contains("timestamp"))
  }

  private val nameGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("property: replaying growing header sequences never reorders/retypes") {
    val gen = Gen.nonEmptyListOf(nameGen).map(_.distinct)
    (0 until 100).foreach { i =>
      val names = gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      // replay prefixes in increasing-width order: every intermediate
      // schema must be a prefix of the final one with types preserved
      var cur = StructType(Nil)
      (1 to names.length).foreach { k =>
        val next = sniffedSchema(cur, names.take(k))
        assert(next.fields.map(_.name).toSeq == names.take(k))
        assert(next.fields.take(cur.fields.length).toSeq == cur.fields.toSeq)
        cur = next
      }
    }
  }
}
