package graft.cli

import graft.api.{QueryRequest, QueryService, ServerInfo}
import graft.catalog.BucketCatalog
import graft.core.{CandleDuration, TimeBucketKey}
import graft.sql.SqlService
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The `marketstore connect` session surface
  * (cmd/connect/session/client.go:67-82): backslash commands `\show`,
  * `\create`, `\destroy`, `\getinfo`, `\trim`, `\load`, plus raw SQL
  * for anything else. Output lines go through `out` (stdout by
  * default) so a shell wrapper or a test can capture them; commands
  * that produce rows also RETURN the DataFrame, keeping the data path
  * lazy/distributed — printing is the only collect.
  */
class Session(
    spark: SparkSession,
    catalog: BucketCatalog,
    out: String => Unit = println(_),
    csvTarget: String = Session.DefaultCsvTarget) {

  private val queryService = new QueryService(catalog)
  private val sqlService = new SqlService(spark, Some(catalog))

  /** Execute one command line; returns the result rows when the
    * command has any (\show and SQL).
    */
  def exec(line: String): Option[DataFrame] = {
    val trimmed = line.trim
    val cmd = trimmed.takeWhile(!_.isWhitespace)
    val rest = trimmed.drop(cmd.length).trim
    cmd match {
      case "\\show" => show(rest)
      case "\\create" => { create(rest); None }
      case "\\destroy" => {
        catalog.destroy(TimeBucketKey.parse(rest.split("\\s+")(0)))
        None
      }
      case "\\getinfo" => { getinfo(rest); None }
      case "\\trim" => { trim(rest); None }
      case "\\load" => { load(rest); None }
      case "\\help" | "\\?" | "help" => { out(Session.HelpText); None }
      case _ => Some(sqlService.sql(trimmed))
    }
  }

  /** `\show TBK <from> [<to>] [csv]` — dates in the reference's
    * literal formats (show.go:66-101); a `csv` token redirects the
    * rows to `mstore-csv-output.csv` (show.go:80-81) instead of
    * printing them.
    */
  private def show(args: String): Option[DataFrame] = {
    val parts = args.split("\\s+").toSeq.filter(_.nonEmpty)
    if (parts.isEmpty) { out("""Not enough arguments, see '\help'"""); return None }
    val toCsv = parts.drop(1).exists(_.equalsIgnoreCase("csv"))
    val times = parts.drop(1)
      .filterNot(a => Seq("between", "and", "csv").contains(a.toLowerCase))
      .flatMap(SqlService.parseDateLiteralNs)
    val start = times.headOption.getOrElse(0L)
    val end = times.drop(1).headOption.getOrElse(Long.MaxValue)
    val raw = queryService.queryMulti(QueryRequest(parts.head,
      epochStart = start / 1000000000L, startNanos = (start % 1000000000L).toInt,
      epochEnd = end / 1000000000L,
      endNanos = if (end == Long.MaxValue) 999999999 else (end % 1000000000L).toInt))
    // pinned display order regardless of the store's physical layout:
    // the bucket's own columns first (Epoch-led, as declared), the
    // engine's symbol key last — the reference's show prints the
    // ColumnSeries columns (show.go:80-101)
    val df = raw.select((raw.columns.filterNot(_ == "symbol") :+ "symbol")
      .map(org.apache.spark.sql.functions.col): _*)
    if (toCsv) {
      // single local CSV file like the reference's writer (the rows
      // are the same bounded collect the print path does)
      val rows = df.collect()
      val w = new java.io.PrintWriter(csvTarget, "UTF-8")
      try {
        w.println(df.columns.mkString(","))
        rows.foreach(r => w.println(r.toSeq.mkString(",")))
      } finally w.close()
      out(s"wrote ${rows.length} rows to $csvTarget")
    } else {
      out(df.columns.mkString("  "))
      df.collect().foreach(r => out(r.toSeq.mkString("  ")))
    }
    Some(df)
  }

  /** `\create SYM/TF/AG:Symbol/Timeframe/AttributeGroup
    *   Name1,Name2/type:Name3/type fixed|variable`
    * (help.go:27-36; shapes parsed like
    * utils/io/datashape.go DataShapesFromInputString).
    */
  private def create(args: String): Unit = {
    val parts = args.split("\\s+")
    require(parts.length >= 3, """\create needs <key> <shapes> <fixed|variable>""")
    val tbk = TimeBucketKey.parse(parts(0).split(":")(0))
    val fields = parts(1).split(":").toSeq.flatMap { group =>
      val two = group.split("/")
      require(two.length == 2, s"$group: data shape is not names/type")
      val dt = Session.typeNames.getOrElse(two(1).toLowerCase,
        throw new IllegalArgumentException(s"${two(1)}: not a supported type"))
      two(0).split(",").toSeq.map(n => Session.field(n, dt, two(1).toLowerCase))
    }
    val withEpoch =
      if (fields.exists(_.name == "Epoch")) fields
      else StructField("Epoch", LongType) +: fields
    catalog.create(tbk, StructType(withEpoch), parts(2).toLowerCase == "variable")
    out(s"created ${parts(0)}")
  }

  /** `\getinfo TBK` (create.go getinfo output shape). */
  private def getinfo(args: String): Unit = {
    val tbk = TimeBucketKey.parse(args.split("\\s+")(0))
    val (schema, variable) = catalog.getInfo(tbk.attGroup)
    out(s"Bucket: ${tbk.key}")
    out(s"Latest Year: ${catalog.latestYear(tbk).getOrElse(0)}, " +
      s"RecordType: ${if (variable) "VARIABLE" else "FIXED"}, " +
      s"TF: ${CandleDuration.parse(tbk.timeframe).string}")
    out(schema.fields.map(f =>
      s"${f.name}:${Session.typeNameOf(f)}").mkString("Data Types: {", ", ", "}"))
  }

  /** `\trim TBK <date>` — zero data on/after the date (trim.go:15-65). */
  private def trim(args: String): Unit = {
    val parts = args.split("\\s+")
    require(parts.length >= 2, """\trim needs <key> <date>""")
    val ns = SqlService.parseDateLiteralNs(parts(1)).getOrElse(
      throw new IllegalArgumentException(s"bad date: ${parts(1)}"))
    catalog.trim(TimeBucketKey.parse(parts(0)), ns / 1000000000L)
    out(s"trimmed ${parts(0)} from ${parts(1)}")
  }

  /** `\load TBK <csv-file> [<time-format>]` (load.go + loader/utils.go). */
  private def load(args: String): Unit = {
    val parts = args.split("\\s+")
    require(parts.length >= 2, """\load needs <key> <csv file>""")
    val n = graft.sources.CsvLoader.load(spark, catalog,
      TimeBucketKey.parse(parts(0)), parts(1),
      timeFormat = parts.drop(2).headOption)
    out(s"loaded $n rows into ${parts(0)}")
  }
}

object Session {
  /** The reference's fixed CSV dump target (cmd/connect/session/
    * show.go:80-81).
    */
  val DefaultCsvTarget = "mstore-csv-output.csv"

  /** Reference element-type names (utils/io/datatypes.go:65-79) →
    * Spark types, unsigned widened (SURVEY §1.2).
    */
  val typeNames: Map[String, DataType] = Map(
    "float32" -> FloatType, "float64" -> DoubleType,
    "int16" -> ShortType, "int32" -> IntegerType, "int64" -> LongType,
    "byte" -> ByteType, "bool" -> BooleanType,
    "uint8" -> ShortType, "uint16" -> IntegerType, "uint32" -> LongType,
    "uint64" -> DecimalType(20, 0), "string16" -> StringType)

  private def field(name: String, dt: DataType, typeName: String): StructField =
    if (typeName == "string16")
      // varchar(16) metadata so the catalog's STRING16 length cap bites
      StructField(name, StringType, metadata = new MetadataBuilder()
        .putString("__CHAR_VARCHAR_TYPE_STRING", "varchar(16)").build())
    else StructField(name, dt)

  private def typeNameOf(f: StructField): String = {
    val isVarchar = org.apache.spark.sql.catalyst.util.CharVarcharUtils
      .getRawType(f.metadata).exists(_.isInstanceOf[VarcharType])
    if (isVarchar) "string16"
    else typeNames.collectFirst {
      case (n, dt) if dt == f.dataType && !n.startsWith("u") => n
    }.getOrElse(f.dataType.simpleString)
  }

  val HelpText: String =
    s"""${ServerInfo.Version} session commands:
       |  \\show <key> <from> [<to>] [csv]   display rows (csv: write $DefaultCsvTarget)
       |  \\create <key>:<cat-keys> <shapes> <fixed|variable>
       |  \\destroy <key>              drop a bucket
       |  \\getinfo <key>              bucket schema + record type
       |  \\trim <key> <date>          delete rows on/after date
       |  \\load <key> <csv> [<fmt>]   import a CSV file
       |  <sql>                       anything else runs as SQL
       |""".stripMargin
}
