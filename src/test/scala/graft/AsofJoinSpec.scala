package graft

import java.sql.Timestamp

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, "u1", ts("2026-01-01 10:00:00")),
      (2L, "u1", ts("2026-01-01 12:00:00")),
      (3L, "u2", ts("2026-01-01 11:00:00")),
      (4L, "u3", ts("2026-01-01 11:00:00"))) // no right rows for u3
      .toDF("id", "user", "ts")
    val right = Seq(
      ("u1", ts("2026-01-01 09:00:00"), 1.0),
      ("u1", ts("2026-01-01 12:00:00"), 2.0), // equal ts → included (<=)
      ("u2", ts("2026-01-01 11:30:00"), 3.0)) // after left row → excluded
      .toDF("user", "ts", "v")

    val out = AsofJoin.asofJoin(left, right, Seq("user"), "ts", Seq("v"))
      .orderBy("id")
      .select("id", "asof_ts", "v")
      .collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)).map(_.toString),
        Option(r.get(2))))

    assert(out.toSeq == Seq(
      (1L, Some("2026-01-01 09:00:00.0"), Some(1.0)),
      (2L, Some("2026-01-01 12:00:00.0"), Some(2.0)),
      (3L, None, None),
      (4L, None, None)))
  }

  test("asof result keeps every left row exactly once") {
    val left = (1L to 100L).map(i =>
      (i, s"u${i % 5}", ts(f"2026-01-01 ${i % 24}%02d:00:00")))
      .toDF("id", "user", "ts")
    val right = Seq(("u0", ts("2026-01-01 00:00:00"), 9.0))
      .toDF("user", "ts", "v")
    val out = AsofJoin.asofJoin(left, right, Seq("user"), "ts", Seq("v"))
    assert(out.count() == 100)
    assert(out.select("id").distinct().count() == 100)
  }
}
