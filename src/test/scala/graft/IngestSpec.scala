package graft

import java.nio.file.{Files, Paths}

import graft.etl.Ingest

/** Ingest edge cases: header-scan fallback, filename year parsing
  * (including the reference's ROC-regex quirk, reproduced faithfully),
  * file routing.
  */
class IngestSpec extends SparkSpec {

  test("smart csv falls back to plain read when keyword is absent") {
    val f = Files.createTempFile("graft", ".csv")
    Files.write(f, "a,b\n1,2\n3,4\n".getBytes("UTF-8"))
    val df = Ingest.smartReadCsv(spark, f.toString, "utf-8", "不存在")
    assert(df.columns.take(2).toSeq == Seq("a", "b"))
    assert(df.count() == 2)
  }

  test("header scan only looks at the first ~50 lines") {
    val lines = (1 to 60).map(i => s"junk_$i") ++
      Seq("交易日期,金額", "01/05,100")
    val f = Files.createTempFile("graft", ".csv")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    // keyword beyond line 50 → fallback plain read, junk_1 becomes header
    val df = Ingest.smartReadCsv(spark, f.toString, "utf-8", "交易日期")
    assert(df.columns.head == "junk_1")
  }

  test("filename year/month: western, ROC, and the ROC-regex quirk") {
    assert(Ingest.parseFilenameYearMonth("玉山202403帳單.csv") == (2024, 3))
    assert(Ingest.parseFilenameYearMonth("玉山113年1月.csv") == (2024, 1))
    assert(Ingest.parseFilenameYearMonth("nothing.csv") == (2024, 1))
    // reference quirk (etl.py:274-282): a western year in ROC format
    // matches the ROC regex on its last digits — '2024年01月' → 024+1911.
    // Faithfully reproduced; real filenames use one convention or the other.
    assert(Ingest.parseFilenameYearMonth("華南2024年01月.html") == (1935, 1))
  }

  test("routing keeps statement extensions and skips unknown banks") {
    val d = Files.createTempDirectory("graft-route").toString
    for (n <- Seq("玉山202401.csv", "國泰202401.csv", "富邦202401.csv",
        "玉山.txt", ".玉山202402.csv"))
      Files.write(Paths.get(s"$d/$n"), "x".getBytes)
    val routed = Ingest.routeFiles(d).map { case (p, b) =>
      (p.split('/').last, b) }.toSet
    assert(routed == Set(
      ("玉山202401.csv", "esun_bank"), ("國泰202401.csv", "cube_bank")))
  }
}
