package graft.ingest

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX (SpreadsheetML) reader — SURVEY §2.1 S4: the reference
  * loads Excel sources (dof_annual_sales, dof_421a) via xlrd
  * (`load_dataset.py:280-303`, `requirements.txt:8`). Spark has no
  * built-in Excel source, so this implements the subset the pipeline
  * needs: first worksheet, shared-string resolution, inline strings,
  * numeric cells — using only JDK zip + StAX (zero extra deps).
  *
  * Ingestion shape matches the reference's: Excel is converted
  * DRIVER-SIDE during the (small) ingest step, then all heavy
  * processing happens on the resulting DataFrame. Excel files are
  * human-published artifacts (a few MB), never the 100 TB path.
  */
object Xlsx {

  /** Parse the first sheet into rows of optional cell strings. */
  def readRows(path: String): Seq[Seq[Option[String]]] = {
    val zip = new ZipFile(path)
    try {
      val shared = {
        val e = zip.getEntry("xl/sharedStrings.xml")
        if (e == null) IndexedSeq.empty[String]
        else parseSharedStrings(zip.getInputStream(e))
      }
      val sheetEntry = {
        val preferred = zip.getEntry("xl/worksheets/sheet1.xml")
        if (preferred != null) preferred
        else {
          import scala.jdk.CollectionConverters._
          zip.entries().asScala
            .filter(_.getName.matches("xl/worksheets/sheet\\d+\\.xml"))
            .toSeq.sortBy(_.getName).headOption
            .getOrElse(throw new IllegalArgumentException(
              s"no worksheet found in $path"))
        }
      }
      parseSheet(zip.getInputStream(sheetEntry), shared)
    } finally zip.close()
  }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    var current: StringBuilder = null
    var inText = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => current = new StringBuilder
            case "t" => inText = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inText && current != null =>
          current.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inText = false
            case "si" => out += current.toString; current = null
            case _ =>
          }
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  /** Column index from an A1-style reference ("C7" -> 2). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref(i).isLetter) {
      acc = acc * 26 + (ref(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def parseSheet(
      in: InputStream, shared: IndexedSeq[String]): Seq[Seq[Option[String]]] = {
    val rows = ArrayBuffer.empty[Seq[Option[String]]]
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    var row: ArrayBuffer[Option[String]] = null
    var cellRef = ""
    var cellType = ""
    var inV = false
    var inInlineT = false
    val value = new StringBuilder
    def endCell(): Unit = if (row != null && value.nonEmpty) {
      val idx = colIndex(cellRef)
      while (row.length <= idx) row += None
      val v = value.toString
      row(idx) = Some(if (cellType == "s") shared(v.trim.toInt) else v)
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = ArrayBuffer.empty
            case "c" =>
              cellRef = Option(r.getAttributeValue(null, "r")).getOrElse("A1")
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              value.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inInlineT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS =>
          if (inV || inInlineT) value.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inInlineT = false
            case "c" => endCell()
            case "row" => rows += row.toSeq; row = null
            case _ =>
          }
        case _ =>
      }
    }
    rows.toSeq
  }

  /** Header row + declared schema -> typed DataFrame. Values are read
    * as strings and cast per the declared schema (same
    * no-inference-in-production rule as CsvSource).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    rowsToDataFrame(spark, readRows(path), schema, path)

  /** Shared header-match + declared-schema cast for both Excel formats
    * ([[Xlsx.read]], [[Xls.read]]).
    */
  private[ingest] def rowsToDataFrame(
      spark: SparkSession,
      rows: Seq[Seq[Option[String]]],
      schema: StructType,
      path: String): DataFrame = {
    require(rows.nonEmpty, s"empty worksheet: $path")
    val header = rows.head.map(_.getOrElse(""))
    val idx = schema.fields.map(f => header.indexOf(f.name))
    val missing = schema.fields.zip(idx).collect { case (f, -1) => f.name }
    require(missing.isEmpty, s"columns not found in $path: ${missing.mkString(",")}")
    val stringSchema = StructType(schema.fields.map(f =>
      StructField(f.name, StringType, nullable = true)))
    val data = rows.tail.map { r =>
      Row.fromSeq(idx.map(i => if (i < r.length) r(i).orNull else null).toSeq)
    }
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), stringSchema)
    raw.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }
}

/** XLSX source with declared schema (S4). */
final case class XlsxSource(
    name: String,
    path: String,
    schema: StructType) extends SourceSpec {
  def read(spark: SparkSession): DataFrame = Xlsx.read(spark, path, schema)
}
