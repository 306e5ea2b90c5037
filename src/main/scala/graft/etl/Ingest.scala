package graft.etl

import java.nio.charset.{Charset, CodingErrorAction}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statement-file ingestion (SURVEY §2.1 S1-S4).
  *
  * Bank statements are KB-sized monthly files, so the header hunt and HTML
  * parse run driver-side; the parsed body still becomes a real DataFrame so
  * every downstream transform is Spark. Each file lands in ONE partition
  * with an explicit `_row_idx` — statement row order is semantics-bearing
  * (master-row fill-down, SURVEY §2.7 W1/W3).
  */
object Ingest {

  /** Row-order column added to every ingested file. */
  val RowIdx = "_row_idx"

  private def decode(path: String, encoding: String): String = {
    // errors='replace' (etl.py:133): malformed bytes → U+FFFD, never throw
    val dec = Charset.forName(encoding).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(Files.readAllBytes(Paths.get(path))))
      .toString
  }

  /** Smart CSV (etl.py:129-152): scan the first 50 lines for the configured
    * header keyword, drop the preamble above it, parse the remainder as CSV
    * (malformed lines dropped). Falls back to a plain header=0 read when the
    * keyword is absent.
    */
  def smartReadCsv(spark: SparkSession, path: String, encoding: String,
                   headerKeyword: String): DataFrame = {
    val text = decode(path, encoding)
    val lines = text.split("\n", -1).toSeq.map(_.stripSuffix("\r"))
    val headerIdx = lines.take(51).zipWithIndex.collectFirst {
      case (l, i) if headerKeyword.nonEmpty && l.contains(headerKeyword) => i
    }
    val body = headerIdx.map(lines.drop).getOrElse(lines)
      .filter(_.nonEmpty)
    csvFromLines(spark, body)
  }

  /** Parse in-memory CSV lines into a single-partition all-string DataFrame
    * with `_row_idx`. DROPMALFORMED mirrors pandas on_bad_lines='skip'.
    */
  def csvFromLines(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    val ds = spark.createDataset(lines).coalesce(1)
    val df = spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .csv(ds)
    val trimmed = df.columns.map(_.trim) // etl.py:319
    df.toDF(trimmed.toIndexedSeq: _*)
      .coalesce(1)
      .withColumn(RowIdx, monotonically_increasing_id())
  }

  /** HTML table source (etl.py:289-304, hncb): find the `<table>` whose text
    * contains the header keyword, first row = header (newlines in header
    * cells flattened to single spaces, etl.py:301), rest = data. Minimal
    * tag-stripping parser — no HTML lib ships with Spark, and statement
    * pages are simple generated tables.
    */
  def readHtmlTable(spark: SparkSession, path: String, encoding: String,
                    headerKeyword: String): DataFrame = {
    val html = decode(path, encoding)
    val tables = """(?is)<table\b.*?</table>""".r
      .findAllIn(html).toSeq
    val target = tables.find(stripTags(_).contains(headerKeyword))
      .getOrElse(throw new IllegalArgumentException(
        s"no <table> containing '$headerKeyword' in $path"))
    val rows = """(?is)<tr\b.*?</tr>""".r.findAllIn(target).toSeq.map { tr =>
      """(?is)<t[dh]\b.*?</t[dh]>""".r.findAllIn(tr).toSeq.map(stripTags)
    }.filter(_.nonEmpty)
    require(rows.nonEmpty, s"empty table in $path")
    val header = rows.head.map(h =>
      h.replace("\n", " ").split("\\s+").filter(_.nonEmpty).mkString(" "))
    val width = header.length
    val data = rows.tail.map(r =>
      org.apache.spark.sql.Row.fromSeq(r.padTo(width, "").take(width)))
    val schema = org.apache.spark.sql.types.StructType(header.map(
      org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema)
      .withColumn(RowIdx, monotonically_increasing_id())
  }

  private def stripTags(s: String): String =
    s.replaceAll("(?is)<(script|style)\\b.*?</\\1>", "")
      .replaceAll("(?s)<[^>]*>", "")
      .replace("&nbsp;", " ").replace("&amp;", "&")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .trim

  /** Directory scan + bank routing (etl.py:463-482): keep
    * `.csv/.xlsx/.xls/.html`, skip dotfiles, route by the first matching
    * filename keyword.
    */
  def routeFiles(dataDir: String): Seq[(String, String)] = {
    val dir = new java.io.File(dataDir)
    if (!dir.isDirectory) return Nil
    dir.listFiles().toSeq.map(_.getName).sorted
      .filterNot(_.startsWith("."))
      .filter(_.matches("(?i).*\\.(csv|xlsx|xls|html)$"))
      .flatMap { name =>
        EtlConfigs.bankKeywordMap.collectFirst {
          case (kw, bankId) if name.contains(kw) =>
            (s"$dataDir/$name", bankId)
        }
      }
  }

  /** Filename → (baseYear, billMonth) (etl.py:271-282): western `202401`,
    * ROC `113年1月` (+1911). Defaults 2024/1.
    */
  def parseFilenameYearMonth(filename: String): (Int, Int) = {
    val roc = """(\d{2,3})年(\d{1,2})月""".r.findFirstMatchIn(filename)
    val western = """(20\d{2})(\d{2})""".r.findFirstMatchIn(filename)
    roc match {
      case Some(m) => (m.group(1).toInt + 1911, m.group(2).toInt)
      case None => western match {
        case Some(m) => (m.group(1).toInt, m.group(2).toInt)
        case None => (2024, 1)
      }
    }
  }
}
