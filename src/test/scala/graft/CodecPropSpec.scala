package graft

import graft.wire.{MsgPack, NumpyCodec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the wire codecs: arbitrary nested values through
  * msgpack, arbitrary typed rows through the NumpyDataset byte layout.
  */
class CodecPropSpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // decode yields Long for ints and Vector for arrays — generate in
  // that normal form so round-trip equality is plain ==
  private val leaf: Gen[Any] = Gen.oneOf(
    Gen.long.map(x => x: Any),
    Gen.chooseNum(-1e12, 1e12).map(x => x: Any),
    Gen.asciiPrintableStr.map(x => x: Any),
    Gen.oneOf(true, false).map(x => x: Any),
    Gen.const(null: Any))

  private def nested(depth: Int): Gen[Any] =
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> Gen.listOfN(3, nested(depth - 1)).map(_.toVector: Any),
      2 -> Gen.mapOfN(3, Gen.zip(Gen.identifier, nested(depth - 1))).map(x => x: Any))

  test("msgpack round-trips arbitrary nested values") {
    check(Prop.forAll(nested(3)) { v =>
      MsgPack.decode(MsgPack.encode(v)) == v
    })
  }

  test("msgpack round-trips the integer boundaries exactly") {
    val edges = Seq(0L, 1L, -1L, 31L, 32L, -31L, -32L, -33L, 127L, 128L, -128L, -129L,
      255L, 256L, 32767L, 32768L, -32768L, -32769L, 65535L, 65536L,
      Int.MaxValue.toLong, Int.MaxValue + 1L, Int.MinValue.toLong, Int.MinValue - 1L,
      Long.MaxValue, Long.MinValue)
    edges.foreach(v => assert(MsgPack.decode(MsgPack.encode(v)) == v, s"edge $v"))
  }

  test("msgpack round-trips binary blobs of every length class") {
    check(Prop.forAll(Gen.chooseNum(0, 70000)) { n =>
      val b = Array.tabulate(n)(i => (i * 31).toByte)
      java.util.Arrays.equals(
        MsgPack.decode(MsgPack.encode(b)).asInstanceOf[Array[Byte]], b)
    }, n = 30)
  }

  test("unsigned wire dtypes decode with their true widths and full ranges") {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(width: Int, vals: Long*): Array[Byte] = {
      val b = ByteBuffer.allocate(width * vals.size).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach { v => width match {
        case 1 => b.put(v.toByte); case 2 => b.putShort(v.toShort)
        case 4 => b.putInt(v.toInt); case 8 => b.putLong(v) } }
      b.array()
    }
    val ds = Map[Any, Any](
      "names" -> Vector("A", "B", "C", "D"),
      "types" -> Vector("u1", "u2", "u4", "u8"),
      "data" -> Vector(
        le(1, 255L, 1L), le(2, 65535L, 2L),
        le(4, 4294967295L, 3L), le(8, -1L /* 2^64-1 */, 4L)),
      "length" -> 2L)
    val (schema, groups) = NumpyCodec.decode(ds)
    assert(schema.map(_.dataType.simpleString) ==
      Seq("smallint", "int", "bigint", "decimal(20,0)"))
    val rows = groups.head._2
    assert(rows(0).getShort(0) == 255.toShort)
    assert(rows(0).getInt(1) == 65535)
    assert(rows(0).getLong(2) == 4294967295L)
    assert(rows(0).getDecimal(3) == new java.math.BigDecimal("18446744073709551615"))
    assert(rows(1).getShort(0) == 1 && rows(1).getInt(1) == 2 &&
      rows(1).getLong(2) == 3L && rows(1).getDecimal(3).longValue() == 4L)
  }

  test("numpy codec round-trips typed rows bit-exactly") {
    val schema = StructType(Seq(
      StructField("Epoch", LongType), StructField("N", IntegerType),
      StructField("P", DoubleType), StructField("Q", FloatType),
      StructField("S", StringType)))
    val rowGen: Gen[Row] = for {
      e <- Gen.long; n <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      p <- Gen.chooseNum(-1e15, 1e15); q <- Gen.chooseNum(-1e6f, 1e6f)
      s <- Gen.resize(16, Gen.asciiPrintableStr)
    } yield Row(e, n, p, q, s)
    check(Prop.forAll(Gen.listOfN(7, rowGen)) { rows =>
      val enc = NumpyCodec.encode(schema, Seq("A/1Min/X" -> rows.take(3), "B/1Min/X" -> rows.drop(3)))
      val (schema2, groups) = NumpyCodec.decode(enc.map { case (k, v) => (k: Any) -> v })
      val flat = groups.sortBy(_._1).flatMap(_._2)
      schema2 == schema && flat == rows.take(3) ++ rows.drop(3) &&
        enc("length") == rows.size.toLong
    }, n = 50)
  }
}
