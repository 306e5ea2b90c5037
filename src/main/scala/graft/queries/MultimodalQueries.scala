package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.{Codecs, Multimodal}
import graft.multimodal.Multimodal.{Image, MediaRow}

/** Oracle-gated multimodal queries.
  *
  * The driver tables carry no binary columns, so the image payloads are
  * GENERATED deterministically from `doc_id` by a closed-form pixel model,
  * then round-tripped through the real Windows BMP codec
  * (graft.multimodal.Codecs.BmpCodec — hand-rolled BITMAPINFOHEADER
  * writer/parser) via magic-byte dispatch. The DuckDB oracle never touches
  * bytes: it recomputes the expected statistics straight from the pixel
  * model, so a hash match proves encode → container bytes → decode →
  * feature-extract is exact, stride padding and BGR row order included.
  *
  * Every emitted column is integer-exact (sums/min/max, not float means),
  * which is what makes an independent SQL replica possible — see
  * Multimodal.imageStats.
  */
object MultimodalQueries {

  /** Pixel model: w = 4 + d%5 (exercises all four BMP stride paddings:
    * w=5,6,7 pad rows to 16/20/24 bytes, w=4,8 need none), h = 4 + (d%3)*2,
    * channel values are independent mod-256 linear forms of (d, x, y).
    */
  private def q106(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val media = docs.mapPartitions(_.map { d =>
      val w = (4 + d % 5).toInt
      val h = (4 + (d % 3) * 2).toInt
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 3
          px(o) = ((d * 31 + x * 7 + y * 13) % 256).toByte
          px(o + 1) = ((d * 17 + x * 11 + y * 5) % 256).toByte
          px(o + 2) = ((d * 29 + x * 3 + y * 19) % 256).toByte
          x += 1
        }
        y += 1
      }
      MediaRow(d, "image", Codecs.BmpCodec.encode(Image(d, w, h, 3, px)),
        "bmp")
    })
    Multimodal.imageStats(media, Codecs.AutoCodec)
      .select(col("media_id").as("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"),
        element_at(col("ch_sums"), 1).as("r_sum"),
        element_at(col("ch_sums"), 2).as("g_sum"),
        element_at(col("ch_sums"), 3).as("b_sum"),
        col("px_min").cast("long").as("px_min"),
        col("px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  private val q106Sql =
    """WITH dims AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
      |         CAST(4 + (doc_id % 3) * 2 AS BIGINT) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |    (doc_id*31 + x*7 + y*13) % 256 AS r,
      |    (doc_id*17 + x*11 + y*5) % 256 AS g,
      |    (doc_id*29 + x*3 + y*19) % 256 AS b
      |  FROM dims, LATERAL (SELECT unnest(generate_series(0, w-1)) AS x),
      |             LATERAL (SELECT unnest(generate_series(0, h-1)) AS y))
      |SELECT doc_id, MAX(w) AS width, MAX(h) AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST(SUM(r) AS BIGINT) AS r_sum, CAST(SUM(g) AS BIGINT) AS g_sum,
      |  CAST(SUM(b) AS BIGINT) AS b_sum,
      |  CAST(LEAST(MIN(r), MIN(g), MIN(b)) AS BIGINT) AS px_min,
      |  CAST(GREATEST(MAX(r), MAX(g), MAX(b)) AS BIGINT) AS px_max
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_image_stats" -> (q106(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q106_image_stats" -> q106Sql)
}
