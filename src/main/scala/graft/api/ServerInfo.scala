package graft.api

import graft.catalog.BucketCatalog
import org.apache.spark.sql.types._

/** Numpy dtype-string mapping for wire compatibility
  * (utils/io/numpy.go:11-23 typeMap + datatypes.go:41-79 element
  * types). Unsigned reference types widen into the next signed Spark
  * type (SURVEY §1.2); STRING16 is a varchar(16)-capped string.
  */
object NumpyTypes {
  /** dtype string → Spark type (widened where Spark lacks unsigned). */
  val toSpark: Map[String, DataType] = Map(
    "i1" -> ByteType,
    "i2" -> ShortType,
    "i4" -> IntegerType,
    "i8" -> LongType,
    "u1" -> ShortType,
    "u2" -> IntegerType,
    "u4" -> LongType,
    "u8" -> DecimalType(20, 0),
    "f4" -> FloatType,
    "f8" -> DoubleType,
    "U16" -> StringType)

  /** Spark type → dtype string (the signed/primary direction; the
    * u8-widened decimal maps back so buckets created from wire u8
    * columns round-trip GetInfo/Query).
    */
  val toNumpy: Map[DataType, String] = Map(
    ByteType -> "i1",
    ShortType -> "i2",
    IntegerType -> "i4",
    LongType -> "i8",
    FloatType -> "f4",
    DoubleType -> "f8",
    StringType -> "U16",
    BooleanType -> "i1",
    DecimalType(20, 0) -> "u8")

  def fieldToTypeStr(f: StructField): String =
    toNumpy.getOrElse(f.dataType,
      throw new IllegalArgumentException(s"no numpy dtype for ${f.dataType}"))

  /** DataShape vector of a schema: (name, dtype string) pairs — the
    * reference's []DataShape (utils/io/datashape.go:10-22).
    */
  def dataShapes(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.map(f => f.name -> fieldToTypeStr(f))
}

/** Server endpoint shims (frontend/server.go:66-85 + frontend/query.go
  * GetInfo): version string and per-bucket schema/record-type info in
  * the reference's response shape. There is no wire server here — the
  * library is embedded — but the response surface exists so a thin
  * HTTP/gRPC front can expose it unchanged.
  */
object ServerInfo {
  /** utils.Version equivalent. */
  val Version = "graft-spark/0.2"

  final case class BucketInfo(
      attGroup: String,
      isVariable: Boolean,
      dataShapes: Seq[(String, String)],
      symbols: Seq[String],
      timeframes: Map[String, Seq[String]])

  def serverVersion(): String = Version

  /** GetInfo for one attribute group: schema shapes + record type +
    * catalog listing (frontend/query.go:264-288).
    */
  def getInfo(catalog: BucketCatalog, attGroup: String): BucketInfo = {
    val (schema, variable) = catalog.getInfo(attGroup)
    val symbols = catalog.listSymbols(attGroup)
    BucketInfo(
      attGroup = attGroup,
      isVariable = variable,
      dataShapes = NumpyTypes.dataShapes(schema),
      symbols = symbols,
      timeframes = symbols.map(s => s -> catalog.listTimeframes(attGroup, s)).toMap)
  }
}
