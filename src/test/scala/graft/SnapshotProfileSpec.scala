package graft

import graft.operators.{Profile, Snapshot}

/** Snapshot merge (SCD-1 upsert) and single-pass profiling semantics. */
class SnapshotProfileSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSnapshot: delta wins on overlap, both sides' exclusive " +
    "rows survive") {
    val prev = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1))
      .toDF("k", "v", "version")
    val delta = Seq((2L, "B", 2), (4L, "D", 2)).toDF("k", "v", "version")
    val got = Snapshot.mergeSnapshot(prev, delta, Seq("k"), "version")
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
  }

  test("keepLatest is idempotent: merging the same delta twice equals " +
    "merging it once") {
    val prev = Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "v", "version")
    val delta = Seq((2L, "B", 2)).toDF("k", "v", "version")
    val once = Snapshot.mergeSnapshot(prev, delta, Seq("k"), "version")
    val twice = Snapshot.mergeSnapshot(once, delta, Seq("k"), "version")
    assert(twice.select("k", "v").as[(Long, String)].collect().toSet ==
      once.select("k", "v").as[(Long, String)].collect().toSet)
  }

  test("profile matches directly-computed statistics, including nulls " +
    "and non-numeric sentinels") {
    val df = Seq(
      (Some(1), Some("x")), (Some(5), None), (None, Some("x")))
      .toDF("num", "str")
    val got = Profile.profile(df, Seq("num", "str"))
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    assert(got("num") == ((3L, 1L, 2L, 1.0, 5.0)))
    assert(got("str") == ((3L, 1L, 1L, -1.0, -1.0)))
  }
}
