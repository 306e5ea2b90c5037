package graft.etl

import java.io.RandomAccessFile
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Dependency-free SQLite 3 database writer — the reference's `Bills.db`
  * sink (`/root/reference/load_to_db.py:113-135`, `df.to_sql(...,
  * if_exists='replace')`) as a drop-in file any existing SQLite consumer
  * opens unchanged.
  *
  * Implements the public file format (sqlite.org/fileformat2): 4096-byte
  * pages, table B-trees bulk-built bottom-up (leaf pages filled in rowid
  * order, interior levels stacked until a single root), record cells with
  * varint serial types, and a `sqlite_master` catalog on page 1. UTF-8
  * text encoding, schema format 1 — readable by every SQLite since 3.0.
  *
  * Scale posture: a single SQLite file is inherently single-node, so this
  * is a driver-streamed COMPATIBILITY EXPORT (`toLocalIterator`, O(pages)
  * bookkeeping, rows never all materialized) for the bounded outputs the
  * reference actually ships to SQLite — refined bills and RFM group
  * tables. Warehouse-scale data stays parquet (`Load.loadToTable`); the
  * reference's `CREATE INDEX` calls (`load_to_db.py:124-128`) map to
  * partitioning/bucketing there (SURVEY §2.2 K3), not to index B-trees
  * here.
  *
  * Large records spill to real overflow-page chains (spec K-local-bytes
  * split), so arbitrarily long TEXT loads correctly. The one asserted
  * limit: catalog rows (CREATE TABLE statements) must fit page 1.
  */
object Sqlite {

  private val PageSize = 4096
  // File-format constants for table-btree leaf cells at usable size
  // U = 4096: payloads over maxLocal spill to an overflow chain, keeping
  // K local bytes where K = minLocal + (P - minLocal) % (U - 4), clamped
  // back to minLocal if that exceeds maxLocal (sqlite.org/fileformat2).
  private val MaxLeafPayload = PageSize - 35 // 4061
  private val MinLeafPayload = (PageSize - 12) * 32 / 255 - 23 // 489

  /** Write `tables` into a fresh SQLite database file (replace semantics —
    * the reference's `if_exists='replace'`). Returns rows written per
    * table. Column typing: integral → INTEGER, fractional/decimal → REAL,
    * boolean → INTEGER 0/1, date/timestamp → TEXT (ISO — the reference
    * stringifies dates before loading, load_to_db.py:107-110), everything
    * else → TEXT. NULLs stay NULL.
    */
  def writeTables(path: String,
                  tables: Seq[(String, DataFrame)]): Map[String, Long] = {
    Files.deleteIfExists(Paths.get(path))
    val raf = new RandomAccessFile(path, "rw")
    try {
      // page 1 reserved for header + sqlite_master; data pages follow
      var nextPage = 2
      val counts = mutable.Map.empty[String, Long]
      val master = mutable.ArrayBuffer.empty[(String, Int, String)]

      tables.foreach { case (name, df) =>
        val schema = df.schema
        val leafInfo = mutable.ArrayBuffer.empty[(Int, Long)] // (page, lastRowid)
        var rowid = 0L

        // ---- leaf level: fill pages in rowid order
        val page = new PageBuilder(leaf = true)
        var lastInPage = 0L // highest rowid actually ADDED to `page`
        def flushLeaf(): Unit = if (page.cells > 0) {
          writePage(raf, nextPage, page.render())
          leafInfo += ((nextPage, lastInPage))
          nextPage += 1
          page.reset()
        }
        val it = df.toLocalIterator()
        while (it.hasNext) {
          rowid += 1
          val rec = record(it.next(), schema)
          val cell =
            if (rec.length <= MaxLeafPayload) leafCell(rowid, rec)
            else {
              // overflow: keep K local bytes, chain the tail through
              // freshly-written overflow pages (4-byte next + data each)
              val k = {
                val cand = MinLeafPayload +
                  (rec.length - MinLeafPayload) % (PageSize - 4)
                if (cand <= MaxLeafPayload) cand else MinLeafPayload
              }
              val tail = java.util.Arrays.copyOfRange(rec, k, rec.length)
              val perPage = PageSize - 4
              val nPages = (tail.length + perPage - 1) / perPage
              val firstOverflow = nextPage
              (0 until nPages).foreach { i =>
                val pageBuf = ByteBuffer.allocate(PageSize)
                pageBuf.putInt(
                  if (i == nPages - 1) 0 else firstOverflow + i + 1)
                pageBuf.put(tail, i * perPage,
                  math.min(perPage, tail.length - i * perPage))
                writePage(raf, firstOverflow + i, pageBuf.array())
              }
              nextPage += nPages
              varint(rec.length.toLong) ++ varint(rowid) ++
                java.util.Arrays.copyOfRange(rec, 0, k) ++
                ByteBuffer.allocate(4).putInt(firstOverflow).array()
            }
          if (!page.fits(cell)) flushLeaf()
          page.add(cell)
          lastInPage = rowid
        }
        flushLeaf()
        if (leafInfo.isEmpty) { // empty table: one empty leaf root
          writePage(raf, nextPage, page.render())
          leafInfo += ((nextPage, 0L))
          nextPage += 1
        }

        // ---- interior levels until a single root. Fan-out 200 keeps the
        // 12 + 2n + Σ|cell| bound comfortably under the page (cells are
        // ≤ 13 bytes); the last chunk is never a single child (an interior
        // page with only a right pointer would be structurally degenerate)
        var level = leafInfo.toVector
        while (level.length > 1) {
          val chunks = mutable.ArrayBuffer.empty[Vector[(Int, Long)]]
          var i = 0
          while (i < level.length) {
            var end = math.min(i + 200, level.length)
            if (level.length - end == 1) end -= 1
            chunks += level.slice(i, end)
            i = end
          }
          level = chunks.toVector.map { children =>
            val ip = new PageBuilder(leaf = false)
            children.init.foreach { case (child, maxKey) =>
              ip.add(interiorCell(child, maxKey))
            }
            ip.rightMost = children.last._1
            writePage(raf, nextPage, ip.render())
            nextPage += 1
            (nextPage - 1, children.last._2)
          }
        }
        val root = level.head._1
        counts(name) = rowid
        master += ((name, root, createSql(name, schema)))
      }

      // ---- page 1: header + sqlite_master leaf
      val masterPage = new PageBuilder(leaf = true, headerOffset = 100)
      master.zipWithIndex.foreach { case ((name, root, sql), i) =>
        val rec = masterRecord(name, root, sql)
        val cell = leafCell(i + 1L, rec)
        require(masterPage.fits(cell),
          s"sqlite_master overflow: too many/large tables for page 1")
        masterPage.add(cell)
      }
      val totalPages = nextPage - 1
      val page1 = ByteBuffer.allocate(PageSize)
      page1.put(fileHeader(totalPages))
      page1.put(masterPage.render(), 100, PageSize - 100)
      writePage(raf, 1, page1.array())
      counts.toMap
    } finally raf.close()
  }

  /** Single-table convenience — the `df.to_sql(TABLE_NAME, conn,
    * if_exists='replace')` shape.
    */
  def writeTable(path: String, table: String, df: DataFrame): Long =
    writeTables(path, Seq(table -> df))(table)

  // ------------------------------------------------------------ building

  /** One B-tree page under construction. Cells pack from the tail; the
    * pointer array grows from the head — `fits` is the spec's free-space
    * rule, no fragmentation (bulk build never deletes).
    */
  private final class PageBuilder(leaf: Boolean, headerOffset: Int = 0) {
    private val headerSize = if (leaf) 8 else 12
    private val buf = mutable.ArrayBuffer.empty[Array[Byte]]
    private var cellBytes = 0
    var rightMost = 0 // interior pages only
    def cells: Int = buf.length
    def fits(cell: Array[Byte]): Boolean =
      headerOffset + headerSize + 2 * (buf.length + 1) +
        cellBytes + cell.length <= PageSize
    def add(cell: Array[Byte]): Unit = { buf += cell; cellBytes += cell.length }
    def reset(): Unit = { buf.clear(); cellBytes = 0; rightMost = 0 }

    /** Render WITHOUT the headerOffset prefix zeroed region — callers at
      * offset 0 use the array as the whole page; page 1 copies from
      * offset 100.
      */
    def render(): Array[Byte] = {
      val page = ByteBuffer.allocate(PageSize)
      val contentStart = {
        var off = PageSize
        buf.foreach(c => off -= c.length)
        off
      }
      page.position(headerOffset)
      page.put((if (leaf) 13 else 5).toByte)
      page.putShort(0) // no freeblocks
      page.putShort(buf.length.toShort)
      page.putShort((contentStart & 0xffff).toShort)
      page.put(0.toByte) // fragmented bytes
      if (!leaf) page.putInt(rightMost)
      var off = contentStart
      buf.foreach { c =>
        page.putShort(off.toShort)
        off += c.length
      }
      var w = contentStart
      buf.foreach { c =>
        page.position(w)
        page.put(c)
        w += c.length
      }
      page.array()
    }
  }

  private def writePage(raf: RandomAccessFile, pageNo: Int,
                        bytes: Array[Byte]): Unit = {
    raf.seek((pageNo - 1).toLong * PageSize)
    raf.write(bytes)
  }

  private def leafCell(rowid: Long, rec: Array[Byte]): Array[Byte] = {
    require(rec.length <= MaxLeafPayload,
      s"record of ${rec.length} bytes exceeds the single-cell limit " +
        s"($MaxLeafPayload); overflow chains are not implemented")
    varint(rec.length.toLong) ++ varint(rowid) ++ rec
  }

  private def interiorCell(child: Int, key: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(child).array() ++ varint(key)

  // ------------------------------------------------------------ records

  /** SQLite record: varint header (serial types) + big-endian body. */
  private def record(row: Row, schema: StructType): Array[Byte] = {
    val serials = mutable.ArrayBuffer.empty[Array[Byte]]
    val bodies = mutable.ArrayBuffer.empty[Array[Byte]]
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) serials += varint(0L)
      else f.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          val v = row.get(i) match {
            case b: Byte => b.toLong
            case s: Short => s.toLong
            case n: Int => n.toLong
            case l: Long => l
          }
          val (st, body) = encodeInt(v)
          serials += varint(st)
          bodies += body
        case BooleanType =>
          val (st, body) = encodeInt(if (row.getBoolean(i)) 1L else 0L)
          serials += varint(st)
          bodies += body
        case FloatType | DoubleType | _: DecimalType =>
          val d = row.get(i) match {
            case fl: Float => fl.toDouble
            case d: Double => d
            case dec: java.math.BigDecimal => dec.doubleValue()
          }
          serials += varint(7L)
          bodies += ByteBuffer.allocate(8).putDouble(d).array()
        case _ => // TEXT: strings, dates, timestamps, anything else
          val s = row.get(i).toString
          val b = s.getBytes(StandardCharsets.UTF_8)
          serials += varint(13L + 2L * b.length)
          bodies += b
      }
    }
    assemble(serials, bodies)
  }

  private def masterRecord(name: String, root: Int, sql: String)
      : Array[Byte] = {
    val serials = mutable.ArrayBuffer.empty[Array[Byte]]
    val bodies = mutable.ArrayBuffer.empty[Array[Byte]]
    def text(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      serials += varint(13L + 2L * b.length)
      bodies += b
    }
    text("table"); text(name); text(name)
    val (st, body) = encodeInt(root.toLong)
    serials += varint(st)
    bodies += body
    text(sql)
    assemble(serials, bodies)
  }

  private def assemble(serials: mutable.ArrayBuffer[Array[Byte]],
                       bodies: mutable.ArrayBuffer[Array[Byte]])
      : Array[Byte] = {
    val serialLen = serials.map(_.length).sum
    // the header-size varint includes its own length — iterate to the
    // fixpoint (monotone, converges in ≤ 2 rounds at cell-size limits)
    var total = serialLen + 1
    var stable = false
    while (!stable) {
      val t = serialLen + varint(total.toLong).length
      if (t == total) stable = true else total = t
    }
    val hdrVar = varint(total.toLong)
    val out = ByteBuffer.allocate(
      hdrVar.length + serialLen + bodies.map(_.length).sum)
    out.put(hdrVar)
    serials.foreach(out.put)
    bodies.foreach(out.put)
    out.array()
  }

  /** Smallest SQLite integer serial type holding `v`. */
  private def encodeInt(v: Long): (Long, Array[Byte]) = {
    def be(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var x = v
      var i = n - 1
      while (i >= 0) { b(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
      b
    }
    if (v >= Byte.MinValue && v <= Byte.MaxValue) (1L, be(1))
    else if (v >= Short.MinValue && v <= Short.MaxValue) (2L, be(2))
    else if (v >= -(1L << 23) && v < (1L << 23)) (3L, be(3))
    else if (v >= Int.MinValue && v <= Int.MaxValue) (4L, be(4))
    else if (v >= -(1L << 47) && v < (1L << 47)) (5L, be(6))
    else (6L, be(8))
  }

  /** SQLite varint: 1-9 bytes, high bit = continuation, big-endian 7-bit
    * groups (9th byte carries 8 bits — not needed for non-negative page
    * counts/rowids under 2^56, which is all we emit).
    */
  private def varint(v: Long): Array[Byte] = {
    require(v >= 0, s"negative varint $v")
    if (v < 128) Array(v.toByte)
    else {
      val groups = mutable.ArrayBuffer.empty[Byte]
      var x = v
      while (x > 0) { groups += (x & 0x7f).toByte; x >>= 7 }
      val out = groups.reverse.toArray
      (0 until out.length - 1).foreach(i =>
        out(i) = (out(i) | 0x80).toByte)
      out
    }
  }

  private def sqlType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType =>
      "INTEGER"
    case FloatType | DoubleType | _: DecimalType => "REAL"
    case _ => "TEXT"
  }

  private def createSql(name: String, schema: StructType): String =
    schema.fields.map(f => s""""${f.name}" ${sqlType(f.dataType)}""")
      .mkString(s"""CREATE TABLE "$name" (""", ", ", ")")

  private def fileHeader(totalPages: Int): Array[Byte] = {
    val h = ByteBuffer.allocate(100)
    h.put("SQLite format 3\u0000".getBytes(StandardCharsets.US_ASCII))
    h.putShort(PageSize.toShort) // 4096
    h.put(1.toByte).put(1.toByte) // write/read version: legacy journal
    h.put(0.toByte) // reserved bytes per page
    h.put(64.toByte).put(32.toByte).put(32.toByte) // payload fractions
    h.putInt(1) // file change counter
    h.putInt(totalPages)
    h.putInt(0).putInt(0) // freelist: none
    h.putInt(1) // schema cookie
    h.putInt(1) // schema format 1 (max compatibility)
    h.putInt(0) // default cache size
    h.putInt(0) // largest root page (no vacuum)
    h.putInt(1) // text encoding: UTF-8
    h.putInt(0).putInt(0).putInt(0) // user version, inc-vacuum, app id
    h.position(92)
    h.putInt(1) // version-valid-for
    h.putInt(3045000) // sqlite version number
    h.array()
  }
}
