package graft

import graft.wire.{MsgPack, WsServer}
import java.io.{InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Websocket stream endpoint: RFC 6455 handshake + masked-frame client
  * (clients MUST mask, §5.1), msgpack subscribe → pushed payloads —
  * the reference's /ws flow (frontend/stream/stream.go:105-147,
  * 236-281).
  */
class WsSpec extends SparkSpec {

  private def clientHandshake(sock: Socket): Unit = {
    val out = sock.getOutputStream
    out.write(
      ("GET /ws HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n" +
        "Connection: Upgrade\r\nSec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(StandardCharsets.UTF_8))
    out.flush()
    val sb = new StringBuilder
    var done = false
    while (!done) {
      val b = sock.getInputStream.read()
      assert(b != -1, "eof during handshake")
      sb.append(b.toChar)
      if (sb.length >= 4 && sb.substring(sb.length - 4) == "\r\n\r\n") done = true
    }
    assert(sb.toString.contains("101 Switching Protocols"))
    // RFC 6455 §1.3 sample key → fixed accept value
    assert(sb.toString.contains("s3pPLMBiTxaQ9kYGzzhZRbK+xOo="))
  }

  private def sendMasked(out: OutputStream, payload: Array[Byte]): Unit = {
    out.write(0x82) // FIN + binary
    require(payload.length < 126)
    out.write(0x80 | payload.length)
    val mask = Array[Byte](0x12, 0x34, 0x56, 0x78)
    out.write(mask)
    payload.zipWithIndex.foreach { case (b, i) => out.write(b ^ mask(i % 4)) }
    out.flush()
  }

  private def readServerFrame(in: InputStream): Array[Byte] = {
    val b0 = in.read(); val b1 = in.read()
    assert(b0 == 0x82 && (b1 & 0x80) == 0, "expect unmasked binary server frame")
    var len = b1 & 0x7f
    if (len == 126) len = (in.read() << 8) | in.read()
    val data = new Array[Byte](len)
    var off = 0
    while (off < len) off += in.read(data, off, len - off)
    data
  }

  test("subscribe then receive pushed bars; invalid streams get an error") {
    val srv = new WsServer()
    srv.start()
    try {
      val sock = new Socket("127.0.0.1", srv.boundPort)
      sock.setSoTimeout(5000)
      clientHandshake(sock)
      val out = sock.getOutputStream

      // invalid stream → {error: ...} (stream.go:141-147 validStream)
      sendMasked(out, MsgPack.encode(Map("streams" -> Seq("not-a-tbk"))))
      val err = MsgPack.decode(readServerFrame(sock.getInputStream))
        .asInstanceOf[Map[Any, Any]]
      assert(err("error").toString.contains("invalid stream"))

      // valid glob subscription
      sendMasked(out, MsgPack.encode(Map("streams" -> Seq("*/1Min/OHLCV"))))
      // wait until the server registered it (subscribe is async)
      val deadline = System.currentTimeMillis() + 5000
      var delivered = false
      while (!delivered && System.currentTimeMillis() < deadline) {
        srv.push("AAPL/1Min/OHLCV", Map("Open" -> 1.5, "Epoch" -> 60L))
        srv.push("AAPL/5Min/OHLCV", Map("Open" -> 9.9)) // not subscribed
        Thread.sleep(50)
        if (sock.getInputStream.available() > 0) delivered = true
      }
      val got = MsgPack.decode(readServerFrame(sock.getInputStream))
        .asInstanceOf[Map[Any, Any]]
      assert(got("key") == "AAPL/1Min/OHLCV")
      val data = got("data").asInstanceOf[Map[Any, Any]]
      assert(data("Open") == 1.5 && data("Epoch") == 60L)
      sock.close()
    } finally srv.close()
  }

  test("oversized declared frame length drops the connection instead of allocating") {
    val srv = new WsServer()
    srv.start()
    try {
      val sock = new Socket("127.0.0.1", srv.boundPort)
      sock.setSoTimeout(5000)
      clientHandshake(sock)
      val out = sock.getOutputStream
      // 64-bit extended length declaring ~2 GB on an unauthenticated
      // socket — server must close, not allocate
      out.write(0x82)
      out.write(0x80 | 127)
      val len = 0x7FFFFFFFL
      (7 to 0 by -1).foreach(i => out.write(((len >>> (8 * i)) & 0xff).toInt))
      out.write(Array[Byte](0x12, 0x34, 0x56, 0x78)) // mask (never read)
      out.flush()
      assert(sock.getInputStream.read() == -1, "server should close the connection")
      sock.close()
      // the server itself stays healthy for new clients
      val sock2 = new Socket("127.0.0.1", srv.boundPort)
      sock2.setSoTimeout(5000)
      clientHandshake(sock2)
      sock2.close()
    } finally srv.close()
  }

  test("ws server acts as the trigger's push bus") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ws-trig").toString
    val cat = new graft.catalog.BucketCatalog(spark, root)
    cat.write(graft.core.TimeBucketKey.parse("AAPL/1Min/OHLCV"),
      Seq((60L, 1.0), (120L, 2.0)).toDF("Epoch", "Open"))
    val srv = new WsServer()
    srv.start()
    val subs = new graft.streaming.SubscriptionSet
    subs.subscribe("*/*/*") // trigger-level gate open; per-conn globs filter
    val trig = new graft.streaming.StreamTrigger(cat, "OHLCV", srv, subs)
    try {
      val sock = new Socket("127.0.0.1", srv.boundPort)
      sock.setSoTimeout(5000)
      clientHandshake(sock)
      sendMasked(sock.getOutputStream, MsgPack.encode(Map("streams" -> Seq("AAPL/*/*"))))
      // let the subscribe land, then fire the trigger
      val deadline = System.currentTimeMillis() + 5000
      var delivered = false
      while (!delivered && System.currentTimeMillis() < deadline) {
        trig.fire("1Min", Seq(("AAPL", 120L)).toDF("symbol", "Epoch"))
        Thread.sleep(50)
        if (sock.getInputStream.available() > 0) delivered = true
      }
      val got = MsgPack.decode(readServerFrame(sock.getInputStream))
        .asInstanceOf[Map[Any, Any]]
      assert(got("key") == "AAPL/1Min/OHLCV")
      assert(got("data").asInstanceOf[Map[Any, Any]]("Open") == 2.0)
      sock.close()
    } finally { trig.close(); srv.close() }
  }
}
