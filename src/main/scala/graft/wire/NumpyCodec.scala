package graft.wire

import graft.api.NumpyTypes
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}

/** DataFrame rows ↔ the reference's NumpyMultiDataset wire shape
  * (utils/io/numpy.go:45-156): per-column little-endian byte blobs
  * keyed by numpy dtype strings, plus per-TBK start/length maps so one
  * payload carries many buckets' contiguous row spans.
  *
  * U16 is numpy's '<U16' — 16 UTF-32LE code units (64 bytes) per
  * value, zero-padded (datatypes.go:78 maps STRING16 to [16]rune).
  *
  * Wire payloads are driver-bound by design (the reference server
  * also funnels every response through one process); the bound is the
  * query's LIMIT/range, not the table size.
  */
object NumpyCodec {

  private val width: Map[String, Int] = Map(
    "i1" -> 1, "i2" -> 2, "i4" -> 4, "i8" -> 8,
    "u1" -> 1, "u2" -> 2, "u4" -> 4, "u8" -> 8,
    "f4" -> 4, "f8" -> 8, "U16" -> 64)

  /** Encode groups of rows (one per TBK, already contiguous) sharing
    * one schema into the NumpyMultiDataset map (msgpack tags from
    * numpy.go: types/names/data/length + startindex/lengths).
    */
  def encode(schema: StructType, groups: Seq[(String, Seq[Row])]): Map[String, Any] = {
    val types = schema.fields.map(NumpyTypes.fieldToTypeStr)
    val total = groups.map(_._2.size).sum
    val data: Seq[Array[Byte]] = schema.fields.zipWithIndex.toSeq.map { case (f, i) =>
      val w = width(types(i))
      val buf = ByteBuffer.allocate(total * w).order(ByteOrder.LITTLE_ENDIAN)
      groups.foreach { case (_, rows) =>
        rows.foreach(r => putValue(buf, types(i), r.get(i)))
      }
      buf.array()
    }
    var start = 0
    val startIndex = Map.newBuilder[String, Any]
    val lengths = Map.newBuilder[String, Any]
    groups.foreach { case (tbk, rows) =>
      startIndex += tbk -> start.toLong
      lengths += tbk -> rows.size.toLong
      start += rows.size
    }
    Map(
      "types" -> types.toSeq,
      "names" -> schema.fields.map(_.name).toSeq,
      "data" -> data,
      "length" -> total.toLong,
      "startindex" -> startIndex.result(),
      "lengths" -> lengths.result())
  }

  private def putValue(buf: ByteBuffer, t: String, v: Any): Unit = t match {
    // widths MUST match the wire dtype (u1=1, u2=2, u4=4 bytes), not
    // the widened Spark type the value arrives as
    case "i1" | "u1" => buf.put(num(v).toByte)
    case "i2" | "u2" => buf.putShort(num(v).toShort)
    case "i4" | "u4" => buf.putInt(num(v).toInt)
    case "i8" | "u8" => buf.putLong(num(v))
    case "f4" => buf.putFloat(v match {
      case f: Float => f; case d: Double => d.toFloat; case x => num(x).toFloat })
    case "f8" => buf.putDouble(v match {
      case d: Double => d; case f: Float => f.toDouble; case x => num(x).toDouble })
    case "U16" =>
      val s = if (v == null) "" else v.toString
      val cps = s.codePoints().toArray
      var i = 0
      while (i < 16) { buf.putInt(if (i < cps.length) cps(i) else 0); i += 1 }
    case other => throw new IllegalArgumentException(s"numpy encode: dtype $other")
  }

  private def num(v: Any): Long = v match {
    case l: Long => l; case i: Int => i.toLong; case s: Short => s.toLong
    case b: Byte => b.toLong; case b: Boolean => if (b) 1L else 0L
    // u8-widened decimal: longValue() is the unsigned two's-complement
    // bit pattern, exactly what the u8 wire slot holds
    case d: java.math.BigDecimal => d.longValue()
    case null => 0L
    case other => throw new IllegalArgumentException(s"numpy encode: int from $other")
  }

  /** Spark schema for a wire (names, types) pair. */
  def schemaOf(names: Seq[String], types: Seq[String]): StructType =
    StructType(names.zip(types).map { case (n, t) =>
      StructField(n, NumpyTypes.toSpark.getOrElse(t,
        throw new IllegalArgumentException(s"numpy decode: dtype $t")))
    })

  /** Decode a NumpyMultiDataset map into (schema, rows per TBK). */
  def decode(ds: Map[Any, Any]): (StructType, Seq[(String, Seq[Row])]) = {
    val names = ds("names").asInstanceOf[Seq[Any]].map(_.toString)
    val types = ds("types").asInstanceOf[Seq[Any]].map(_.toString)
    val data = ds("data").asInstanceOf[Seq[Any]].map(bin)
    val length = num(ds("length")).toInt
    val schema = schemaOf(names, types)
    val cols: Seq[IndexedSeq[Any]] = types.zip(data).map { case (t, bytes) =>
      val w = width(t)
      require(bytes.length >= length * w, s"short column blob for $t")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      (0 until length).map(_ => getValue(buf, t))
    }
    val rows: IndexedSeq[Row] = (0 until length).map(r =>
      new GenericRow(cols.map(_(r)).toArray))
    val starts = ds.get("startindex").map(_.asInstanceOf[Map[Any, Any]]).getOrElse(Map.empty)
    val lens = ds.get("lengths").map(_.asInstanceOf[Map[Any, Any]]).getOrElse(Map.empty)
    val groups =
      if (starts.isEmpty) Seq("" -> (rows: Seq[Row]))
      else starts.toSeq.map { case (tbk, s) =>
        tbk.toString -> rows.slice(num(s).toInt, num(s).toInt + num(lens(tbk)).toInt)
      }
    (schema, groups)
  }

  private def getValue(buf: ByteBuffer, t: String): Any = t match {
    case "i1" => buf.get()
    case "i2" => buf.getShort()
    case "i4" => buf.getInt()
    case "i8" => buf.getLong()
    // unsigned wire values widen into the next signed Spark type
    // (NumpyTypes.toSpark: u1→short, u2→int, u4→long, u8→decimal)
    case "u1" => ((buf.get() & 0xff).toShort)
    case "u2" => buf.getShort() & 0xffff
    case "u4" => buf.getInt().toLong & 0xffffffffL
    case "u8" =>
      val raw = buf.getLong()
      new java.math.BigDecimal(java.lang.Long.toUnsignedString(raw))
    case "f4" => buf.getFloat()
    case "f8" => buf.getDouble()
    case "U16" =>
      val sb = new StringBuilder
      var i = 0
      while (i < 16) {
        val cp = buf.getInt()
        if (cp != 0) sb.appendAll(Character.toChars(cp))
        i += 1
      }
      sb.result()
    case other => throw new IllegalArgumentException(s"numpy decode: dtype $other")
  }

  private def bin(v: Any): Array[Byte] = v match {
    case b: Array[Byte] => b
    case s: String => java.util.Base64.getDecoder.decode(s) // JSON codec path
    case other => throw new IllegalArgumentException(s"numpy decode: bytes from $other")
  }
}
