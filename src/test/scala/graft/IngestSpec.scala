package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types._

import graft.catalog.{TableLayout, Warehouse}
import graft.ingest.{Fetcher, Xlsx, XlsxSource}

/** S2 (bulk fetch), S4 (Excel source), S8 (at-rest layout) coverage. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-assembled minimal SpreadsheetML zip (shared + inline strings
    * + numerics) — what xlrd consumes in the reference's
    * dof_annual_sales path (`load_dataset.py:280-303`).
    */
  private def writeXlsx(): String = {
    val dir = Files.createTempDirectory("graft-xlsx")
    val f = dir.resolve("sales.xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst><si><t>bbl</t></si><si><t>price</t></si><si><t>year</t></si>
        |<si><t>1000010001</t></si><si><t>1000010002</t></si></sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>500000.5</v></c><c r="C2"><v>2021</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3"><v>750000</v></c><c r="C3"><v>2022</v></c></row>
        |<row r="4"><c r="A4" t="inlineStr"><is><t>1000010003</t></is></c><c r="C4"><v>2023</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    f.toString
  }

  test("Xlsx: shared strings, inline strings, numerics, missing cells") {
    val schema = StructType(Seq(
      StructField("bbl", StringType),
      StructField("price", DoubleType),
      StructField("year", IntegerType)))
    val df = new XlsxSource("sales", writeXlsx(), schema).read(spark)
    assert(df.schema === schema)
    val rows = df.orderBy("bbl").collect()
    assert(rows.length === 3)
    assert(rows(0).getString(0) === "1000010001")
    assert(rows(0).getDouble(1) === 500000.5)
    assert(rows(2).getString(0) === "1000010003")
    assert(rows(2).isNullAt(1)) // sparse row: missing B cell -> null
    assert(rows(2).getInt(2) === 2023)
  }

  test("Xlsx: declared column missing => clear error") {
    val e = intercept[IllegalArgumentException] {
      Xlsx.read(spark, writeXlsx(), StructType(Seq(StructField("nope", StringType))))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("Xlsx colIndex decodes A1 refs") {
    assert(Xlsx.colIndex("A1") === 0)
    assert(Xlsx.colIndex("C7") === 2)
    assert(Xlsx.colIndex("AA3") === 26)
  }

  // ---- binary .xls (BIFF8) — fixtures from tools/make_xls_fixture.py

  test("Xls (BIFF8, mini-stream CFB): SST, inline, NUMBER/RK/MULRK, bool") {
    val rows = graft.ingest.Xls.readRows("src/test/resources/sample_biff8.xls")
    assert(rows.head.map(_.getOrElse("")) === Seq("bbl", "address", "units"))
    assert(rows(1) === Seq(Some("3012340001"), Some("423 Fake St"), Some("42")))
    assert(rows(2) === Seq(Some("3012340002"), Some("9 Inline Ave"), Some("12.5")))
    // RK float + UTF-16 shared string (char outside Latin-1)
    assert(rows(3) === Seq(Some("3012340003"), Some("unitΔwide"), Some("6.25")))
    assert(rows(4) === Seq(Some("7"), Some("8"), Some("9"))) // MULRK
    assert(rows(5) === Seq(None, None, Some("TRUE"))) // BOOLERR
  }

  test("Xls: declared schema load casts like the Xlsx path (S4)") {
    val schema = StructType(Seq(
      StructField("bbl", StringType),
      StructField("units", DoubleType)))
    val df = new graft.ingest.XlsSource(
      "dof", "src/test/resources/sample_biff8.xls", schema).read(spark)
    assert(df.schema === schema)
    val byBbl = df.filter(org.apache.spark.sql.functions.col("bbl")
      .startsWith("30123")).orderBy("bbl").collect()
    assert(byBbl.length === 3)
    assert(byBbl(0).getString(0) === "3012340001")
    assert(byBbl(0).getDouble(1) === 42.0)
    assert(byBbl(1).getDouble(1) === 12.5)
  }

  test("Xls (regular-FAT CFB): SST spanning CONTINUE with mid-string split") {
    val rows = graft.ingest.Xls.readRows(
      "src/test/resources/sample_biff8_large.xls")
    assert(rows.length === 182)
    assert(rows.head.map(_.getOrElse("")) === Seq("id", "name"))
    assert(rows(1) === Seq(Some("1"), Some("row name 0000")))
    assert(rows(180) === Seq(Some("180"), Some("row name 0179")))
    assert(rows(181) === Seq(Some("999"),
      Some("SPLIT-" + "x" * 40 + "-END")))
  }

  test("Xls rejects corrupt input with clear errors, not loops or garbage") {
    import graft.ingest.Xls
    // not an OLE2 file at all
    val notOle = Files.createTempDirectory("graft-xls").resolve("x.xls")
    Files.write(notOle, "this,is,actually,csv\n1,2,3,4\n".getBytes)
    val e1 = intercept[IllegalArgumentException](Xls.readRows(notOle.toString))
    assert(e1.getMessage.contains("signature"))
    // valid CFB container, no Workbook stream (zip of something else)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(
      "src/test/resources/sample_biff8.xls"))
    // corrupt the directory-entry name so the Workbook stream vanishes
    val mangled = bytes.clone()
    val idx = {
      val name = "Workbook".flatMap(c => Seq(c.toByte, 0.toByte)).toArray
      (0 until mangled.length - name.length).find(i =>
        name.indices.forall(j => mangled(i + j) == name(j))).get
    }
    mangled(idx) = 'X'.toByte
    val p2 = Files.createTempDirectory("graft-xls").resolve("m.xls")
    Files.write(p2, mangled)
    val e2 = intercept[IllegalArgumentException](Xls.readRows(p2.toString))
    assert(e2.getMessage.contains("Workbook"))
  }

  test("Xls: record length overrunning the stream fails, not zero-pads") {
    import graft.ingest.Xls
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(
      "src/test/resources/sample_biff8.xls"))
    // patch the BOF record header (type 0x0809, len 0x0010) to declare
    // a length far past the end of the Workbook stream — before the
    // bound check this parsed with fabricated zero bytes
    val mangled = bytes.clone()
    val bof = Array[Byte](0x09, 0x08, 0x10, 0x00)
    val idx = (0 until mangled.length - 4).find(i =>
      bof.indices.forall(j => mangled(i + j) == bof(j))).get
    mangled(idx + 2) = 0xFF.toByte
    mangled(idx + 3) = 0xFF.toByte
    val p = Files.createTempDirectory("graft-xls").resolve("t.xls")
    Files.write(p, mangled)
    val e = intercept[IllegalArgumentException](Xls.readRows(p.toString))
    assert(e.getMessage.contains("truncated BIFF record"))
  }

  test("Xls RK decoding: int, x100, truncated-double forms") {
    import graft.ingest.Xls
    assert(Xls.decodeRk((42 << 2) | 2) === 42.0)
    assert(Xls.decodeRk((1250 << 2) | 3) === 12.5)
    val bits = java.lang.Double.doubleToLongBits(6.25)
    assert(Xls.decodeRk(((bits >>> 32) & 0xFFFFFFFCL).toInt) === 6.25)
    assert(Xls.renderNumber(3012340001.0) === "3012340001")
    assert(Xls.renderNumber(12.5) === "12.5")
  }

  test("Fetcher stages source files locally (S2)") {
    val src = Files.createTempDirectory("graft-src").resolve("data.csv")
    Files.writeString(src, "a,b\n1,2\n")
    val dest = Files.createTempDirectory("graft-stage")
    val staged = Fetcher.download(src.toUri.toString, dest)
    assert(staged.getFileName.toString === "data.csv")
    assert(Files.readString(staged) === "a,b\n1,2\n")
  }

  test("TableLayout clusters + sorts + hive-partitions at rest (S8)") {
    val wh = new Warehouse(Files.createTempDirectory("graft-layout"))
    val df = Tables.orders(spark, sf)
    wh.publishAtomically(
      Map("orders" -> df), generation = 1L,
      layouts = Map("orders" -> TableLayout(
        clusterBy = Seq("o_custkey"), sortBy = Seq("o_custkey"),
        hivePartitionBy = Seq("o_orderstatus"), numFiles = Some(2))))
    // hive partition dirs exist
    val dataDir = wh.root.resolve("data/orders__1")
    val parts = Files.list(dataDir).iterator()
    var sawPartition = false
    while (parts.hasNext) {
      if (parts.next().getFileName.toString.startsWith("o_orderstatus="))
        sawPartition = true
    }
    assert(sawPartition)
    // round-trips with identical content
    assert(wh.table(spark, "orders").count() === df.count())
    // partition pruning: filter on the partition col scans fewer files
    val pruned = wh.table(spark, "orders").filter($"o_orderstatus" === "O")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("OrcSource round-trips with pushdown; TextSource reads raw lines") {
    val dir = Files.createTempDirectory("graft-src")
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "s")
    df.write.orc(dir.resolve("t.orc").toString)
    val orc = graft.ingest.OrcSource("t", dir.resolve("t.orc").toString)
      .read(spark)
    assert(orc.as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // predicate reaches the ORC scan (same pushdown story as parquet)
    val plan = orc.filter($"id" > 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      plan)

    Files.writeString(dir.resolve("raw.txt"),
      "line one\nline two\nline three\n")
    val txt = graft.ingest.TextSource("raw", dir.resolve("raw.txt").toString)
      .read(spark)
    assert(txt.as[String].collect().toSet ===
      Set("line one", "line two", "line three"))
  }
}
