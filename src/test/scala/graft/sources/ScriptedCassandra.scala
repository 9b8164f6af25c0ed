package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** One scripted fixture row with its ring token (the server owns token
  * assignment, like a real cluster — the client never computes tokens). */
final case class FRow(token: Long, traceId: String, parentId: String,
    id: String, kind: String, ts: java.lang.Long, duration: java.lang.Long,
    shared: java.lang.Boolean, lEp: String, rEp: String,
    tags: Map[String, String])

/** Plays a one-keyspace Cassandra over the CQL v4 native protocol —
  * the CassandraV3Source analogue of EsSpanSourceSpec's scripted HTTP
  * cluster: STARTUP/READY, optional PasswordAuthenticator SASL handshake,
  * QUERY with server-side paging (4-byte offset paging state), RESULT Rows
  * in the `zipkin2.span` shape. Columns are served in a DIFFERENT order
  * than `spanTableSchema` and the endpoint UDT declares trailing fields the
  * rows omit — pinning name-matched, partial-UDT decode. Shared by
  * CqlTransportSpec (protocol-level) and MainSpec (CLI-level). */
final class ScriptedCassandra(rows: Seq[FRow],
    requireAuth: Option[(String, String)] = None, failQueries: Boolean = false,
    ssl: Option[javax.net.ssl.SSLContext] = None) {
  val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val server: ServerSocket = ssl match {
    case Some(ctx) => // TLS listener — the CASSANDRA_USE_SSL wire pin
      ctx.getServerSocketFactory.createServerSocket(
        0, 50, InetAddress.getByName("127.0.0.1"))
    case None => new ServerSocket(0, 50, InetAddress.getByName("127.0.0.1"))
  }
  @volatile private var running = true
  def port: Int = server.getLocalPort
  def stop(): Unit = { running = false; server.close() }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s)); t.setDaemon(true); t.start()
      } catch { case _: Exception => () }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def readFrame(in: DataInputStream): (Int, Array[Byte]) = {
    val h = new Array[Byte](9); in.readFully(h)
    val bb = ByteBuffer.wrap(h)
    bb.get(); bb.get(); bb.getShort() // version, flags, stream
    val op = bb.get() & 0xFF
    val body = new Array[Byte](bb.getInt); in.readFully(body)
    (op, body)
  }

  private def writeFrame(out: DataOutputStream, op: Int, body: Array[Byte]): Unit = {
    out.writeByte(0x84); out.writeByte(0); out.writeShort(0)
    out.writeByte(op); out.writeInt(body.length); out.write(body); out.flush()
  }

  private def errorBody(code: Int, msg: String): Array[Byte] = {
    val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
    d.writeInt(code); Cql.writeString(d, msg); b.toByteArray
  }

  private def handle(s: Socket): Unit = {
    try {
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      while (true) {
        val (op, body) = readFrame(in)
        op match {
          case Cql.OpStartup => requireAuth match {
            case None => writeFrame(out, Cql.OpReady, Array.empty)
            case Some(_) =>
              val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
              Cql.writeString(d, "org.apache.cassandra.auth.PasswordAuthenticator")
              writeFrame(out, Cql.OpAuthenticate, b.toByteArray)
          }
          case Cql.OpAuthResponse =>
            val Some((u, p)) = requireAuth
            val token = Cql.readBytes(ByteBuffer.wrap(body))
            val expect = Array[Byte](0) ++ u.getBytes(UTF_8) ++ Array[Byte](0) ++ p.getBytes(UTF_8)
            if (java.util.Arrays.equals(token, expect)) {
              val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
              Cql.writeBytes(d, null)
              writeFrame(out, Cql.OpAuthSuccess, b.toByteArray)
            } else writeFrame(out, Cql.OpError, errorBody(0x0100, "Bad credentials"))
          case Cql.OpQuery =>
            val bb = ByteBuffer.wrap(body)
            val qb = new Array[Byte](bb.getInt); bb.get(qb)
            val cql = new String(qb, UTF_8)
            bb.getShort // consistency
            val flags = bb.get()
            val pageSize = if ((flags & 0x04) != 0) bb.getInt else Int.MaxValue
            val offset =
              if ((flags & 0x08) != 0) ByteBuffer.wrap(Cql.readBytes(bb)).getInt else 0
            queries.add(cql)
            if (failQueries)
              writeFrame(out, Cql.OpError, errorBody(0x2200, "unconfigured table span"))
            else if (cql.trim.toUpperCase.startsWith("INSERT")) {
              // write path (CqlLinkSink): a real server answers INSERT with
              // RESULT Void — the statement itself is recorded in `queries`
              val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
              d.writeInt(1) // kind = Void
              writeFrame(out, Cql.OpResult, b.toByteArray)
            } else {
              val bounds = """token\(trace_id\) >= (-?\d+) AND token\(trace_id\) <= (-?\d+)""".r
              val matched = bounds.findFirstMatchIn(cql) match {
                case Some(m) =>
                  val (lo, hi) = (m.group(1).toLong, m.group(2).toLong)
                  rows.filter(r => r.token >= lo && r.token <= hi)
                case None => rows
              }
              val page = matched.slice(offset, offset + pageSize)
              val next = if (offset + pageSize < matched.size) Some(offset + pageSize) else None
              writeFrame(out, Cql.OpResult, rowsBody(page, next))
            }
          case other =>
            writeFrame(out, Cql.OpError, errorBody(0x000A, s"unexpected opcode $other"))
        }
      }
    } catch { case _: java.io.IOException => () } finally {
      try s.close() catch { case _: java.io.IOException => () }
    }
  }

  /** RESULT Rows body: global tables spec, shuffled column order, typed
    * metadata (varchar/bigint/boolean/map/UDT with trailing fields). */
  private def rowsBody(page: Seq[FRow], nextOffset: Option[Int]): Array[Byte] = {
    val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
    d.writeInt(2) // kind = Rows
    d.writeInt(0x0001 | nextOffset.fold(0)(_ => 0x0002)) // global spec [+ more pages]
    d.writeInt(10)
    nextOffset.foreach { off => d.writeInt(4); d.writeInt(off) } // paging state [bytes]
    Cql.writeString(d, "zipkin2"); Cql.writeString(d, "span")
    def col(n: String, tid: Int): Unit = { Cql.writeString(d, n); d.writeShort(tid) }
    col("id", 0x0D); col("kind", 0x0D); col("trace_id", 0x0D); col("parent_id", 0x0D)
    col("shared", 0x04); col("ts", 0x02); col("duration", 0x02)
    Cql.writeString(d, "tags"); d.writeShort(0x21); d.writeShort(0x0D); d.writeShort(0x0D)
    def udtCol(n: String): Unit = {
      Cql.writeString(d, n); d.writeShort(0x30)
      Cql.writeString(d, "zipkin2"); Cql.writeString(d, "endpoint")
      d.writeShort(3)
      Cql.writeString(d, "service"); d.writeShort(0x0D)
      Cql.writeString(d, "ipv4"); d.writeShort(0x10)
      Cql.writeString(d, "port"); d.writeShort(0x09)
    }
    udtCol("l_ep"); udtCol("r_ep")
    d.writeInt(page.size)
    page.foreach { r =>
      def sv(s: String): Unit =
        if (s == null) d.writeInt(-1)
        else { val x = s.getBytes(UTF_8); d.writeInt(x.length); d.write(x) }
      def lv(v: java.lang.Long): Unit =
        if (v == null) d.writeInt(-1) else { d.writeInt(8); d.writeLong(v) }
      def bv(v: java.lang.Boolean): Unit =
        if (v == null) d.writeInt(-1) else { d.writeInt(1); d.writeByte(if (v) 1 else 0) }
      def udtv(svc: String): Unit =
        if (svc == null) d.writeInt(-1)
        else { // only the service field; trailing UDT fields legitimately absent
          val x = svc.getBytes(UTF_8); d.writeInt(4 + x.length)
          d.writeInt(x.length); d.write(x)
        }
      def mv(m: Map[String, String]): Unit =
        if (m == null) d.writeInt(-1)
        else {
          val inner = new ByteArrayOutputStream(); val di = new DataOutputStream(inner)
          di.writeInt(m.size)
          m.foreach { case (k, v) =>
            val kb = k.getBytes(UTF_8); di.writeInt(kb.length); di.write(kb)
            val vb = v.getBytes(UTF_8); di.writeInt(vb.length); di.write(vb)
          }
          d.writeInt(inner.size); d.write(inner.toByteArray)
        }
      sv(r.id); sv(r.kind); sv(r.traceId); sv(r.parentId)
      bv(r.shared); lv(r.ts); lv(r.duration)
      mv(r.tags); udtv(r.lEp); udtv(r.rEp)
    }
    b.toByteArray
  }
}
