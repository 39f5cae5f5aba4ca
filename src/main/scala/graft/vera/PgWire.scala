package graft.vera

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S1 against a REAL PostgreSQL server with no driver jar: a minimal
  * PostgreSQL frontend/backend protocol v3 client (startup → simple
  * query → `COPY ... TO STDOUT` text stream), used as a Spark source.
  *
  * Why this exists: the reference's core scenario is a server-side-cursor
  * scan of 7 Postgres tables (`main.py:197-207`). The S1 leg runs
  * end-to-end against embedded Derby via Spark's JDBC source
  * ([[Jdbc.scan]]); this class closes the remaining environment gap — a
  * PostgreSQL 15 server exists on the box but no pgjdbc jar does, and the
  * wire protocol is public and stable
  * (https://www.postgresql.org/docs/current/protocol.html) — so the
  * literal reference scenario runs for real: Postgres server → range-
  * partitioned parallel scan → Normalize → Export.
  *
  * Spark-first shape: the DRIVER never pulls rows — it sends one
  * `LIMIT 0` describe and optional min/max bounds queries; each EXECUTOR
  * partition opens its own connection and streams its key-range slice via
  * `COPY (SELECT ...) TO STDOUT`, the same rows the reference's cursor
  * would produce but N-way parallel (the same structural upgrade
  * [[Jdbc.scan]] makes on the JDBC leg). COPY's text stream is
  * backpressured by the socket, so there is no fetchsize knob to tune and
  * no whole-table buffering anywhere; memory per task is one row.
  *
  * Scope: trust/no-auth logins (the test cluster's config; adding MD5 or
  * SASL is orthogonal plumbing), text result format, and the closed VerA
  * dtype vocabulary ([[Schemas.sparkType]]) — bool, Int32, Int64, string,
  * bytea, naive timestamp, json-as-text. The COPY text format unescape
  * (`\N` null, backslash escapes, `\x` bytea hex) is implemented exactly
  * per the COPY docs and pinned by PgSpec round-trip fixtures (newlines,
  * tabs, backslashes, unicode, NULLs, empty strings vs NULL).
  */
object PgWire {

  // ---------------------------------------------------------------- wire

  /** One protocol-v3 connection (blocking socket, single-threaded use). */
  final class Conn(host: String, port: Int, db: String, user: String)
      extends AutoCloseable {
    private val socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    private val in = new DataInputStream(
      new BufferedInputStream(socket.getInputStream, 1 << 16))
    private val out = new DataOutputStream(
      new BufferedOutputStream(socket.getOutputStream, 1 << 14))

    startup()

    private def cstr(s: String): Array[Byte] = {
      val b = s.getBytes(UTF_8)
      java.util.Arrays.copyOf(b, b.length + 1) // trailing NUL
    }

    /** StartupMessage: Int32 len, Int32 196608 (v3.0), key\0value\0 pairs,
      * final \0. No leading type byte (the one message without it). */
    private def startup(): Unit = {
      val body = cstr("user") ++ cstr(user) ++ cstr("database") ++
        cstr(db) ++ Array[Byte](0)
      out.writeInt(8 + body.length)
      out.writeInt(196608)
      out.write(body)
      out.flush()
      // Auth handshake: 'R' AuthenticationOk(0) under trust; then
      // ParameterStatus/BackendKeyData until ReadyForQuery.
      var ready = false
      while (!ready) {
        val (tpe, payload) = readMessage()
        tpe match {
          case 'R' =>
            val code = java.nio.ByteBuffer.wrap(payload).getInt
            require(code == 0,
              s"pgwire: unsupported auth method $code (trust-only client)")
          case 'S' | 'K' | 'N' => () // params, cancel key, notices
          case 'Z' => ready = true
          case 'E' => throw pgError(payload)
          case other =>
            throw new IllegalStateException(
              s"pgwire: unexpected startup message '${other.toChar}'")
        }
      }
    }

    private def readMessage(): (Char, Array[Byte]) = {
      val tpe = in.readByte().toChar
      val len = in.readInt() - 4
      val payload = new Array[Byte](len)
      in.readFully(payload)
      (tpe, payload)
    }

    private def pgError(payload: Array[Byte]): RuntimeException = {
      // ErrorResponse: repeated (Byte1 code, CString value), final \0
      val fields = scala.collection.mutable.Map[Char, String]()
      var i = 0
      while (i < payload.length && payload(i) != 0) {
        val code = payload(i).toChar
        val end = payload.indexOf(0.toByte, i + 1)
        fields(code) = new String(payload, i + 1, end - i - 1, UTF_8)
        i = end + 1
      }
      new RuntimeException("pgwire: " +
        fields.getOrElse('S', "ERROR") + ": " +
        fields.getOrElse('M', "(no message)"))
    }

    private def sendQuery(sql: String): Unit = {
      val body = cstr(sql)
      out.writeByte('Q')
      out.writeInt(4 + body.length)
      out.write(body)
      out.flush()
    }

    /** Run a command (DDL/DML), discard result rows, throw on error. */
    def exec(sql: String): Unit = {
      sendQuery(sql)
      var err: RuntimeException = null
      var done = false
      while (!done) {
        val (tpe, payload) = readMessage()
        tpe match {
          case 'Z' => done = true
          case 'E' => err = pgError(payload)
          case _ => () // 'T'/'D'/'C'/'N'/... — drained
        }
      }
      if (err != null) throw err
    }

    /** Column (name, type OID) pairs off a RowDescription — issued as a
      * `LIMIT 0` so no rows cross the wire. */
    def describe(sql: String): Seq[(String, Int)] = {
      sendQuery(s"SELECT * FROM ($sql) _g LIMIT 0")
      var cols: Seq[(String, Int)] = Nil
      var err: RuntimeException = null
      var done = false
      while (!done) {
        val (tpe, payload) = readMessage()
        tpe match {
          case 'T' =>
            val bb = java.nio.ByteBuffer.wrap(payload)
            val n = bb.getShort.toInt
            cols = (0 until n).map { _ =>
              val sb = new StringBuilder
              var b = bb.get()
              while (b != 0) { sb.append(b.toChar); b = bb.get() }
              bb.getInt; bb.getShort // table oid, attnum
              val typeOid = bb.getInt
              bb.getShort; bb.getInt; bb.getShort // typlen, typmod, fmt
              (sb.toString, typeOid)
            }
          case 'Z' => done = true
          case 'E' => err = pgError(payload)
          case _ => ()
        }
      }
      if (err != null) throw err
      cols
    }

    /** One scalar text value (first row, first column; null-safe). */
    def scalar(sql: String): Option[String] = {
      sendQuery(sql)
      var v: Option[String] = None
      var first = true
      var err: RuntimeException = null
      var done = false
      while (!done) {
        val (tpe, payload) = readMessage()
        tpe match {
          case 'D' if first =>
            first = false
            val bb = java.nio.ByteBuffer.wrap(payload)
            bb.getShort // field count
            val len = bb.getInt
            if (len >= 0) {
              val b = new Array[Byte](len)
              bb.get(b)
              v = Some(new String(b, UTF_8))
            }
          case 'Z' => done = true
          case 'E' => err = pgError(payload)
          case _ => ()
        }
      }
      if (err != null) throw err
      v
    }

    /** Stream `COPY (sql) TO STDOUT` — one text line per row, already
      * split on tabs, `\N` mapped to null, escapes NOT yet applied (see
      * [[unescapeCopy]]; bytea needs the raw form). The iterator must be
      * fully consumed (it drains the protocol through ReadyForQuery). */
    def copyOut(sql: String): Iterator[Array[String]] = {
      sendQuery(s"COPY ($sql) TO STDOUT")
      new Iterator[Array[String]] {
        private var nextRow: Array[String] = null
        private var finished = false
        private def advance(): Unit = {
          while (nextRow == null && !finished) {
            val (tpe, payload) = readMessage()
            tpe match {
              case 'H' => () // CopyOutResponse
              case 'd' =>
                // one CopyData per row in COPY TO; strip trailing \n
                var end = payload.length
                if (end > 0 && payload(end - 1) == '\n') end -= 1
                nextRow = splitCopyLine(new String(payload, 0, end, UTF_8))
              case 'c' => () // CopyDone — completion follows
              case 'C' | 'N' => ()
              case 'Z' => finished = true
              case 'E' => finished = true; throw pgError(payload)
              case other => throw new IllegalStateException(
                s"pgwire: unexpected COPY message '${other.toChar}'")
            }
          }
        }
        def hasNext: Boolean = { advance(); nextRow != null }
        def next(): Array[String] = {
          advance()
          val r = nextRow; nextRow = null
          if (r == null) throw new NoSuchElementException
          r
        }
      }
    }

    // idempotent: the executor scan closes BOTH eagerly (iterator
    // exhaustion) and unconditionally (task-completion listener) — the
    // second call must be a no-op, never a double-Terminate
    private var closed = false
    override def close(): Unit = if (!closed) {
      closed = true
      try {
        out.writeByte('X'); out.writeInt(4); out.flush() // Terminate
      } catch { case _: Throwable => () }
      socket.close()
    }
  }

  // ------------------------------------------------- COPY text decoding

  /** Split one COPY text line on UNESCAPED tabs; `\N` → null. Values keep
    * their backslash escapes for [[unescapeCopy]] (bytea must see the raw
    * `\\x` form). */
  private[graft] def splitCopyLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '\\' && i + 1 < line.length) {
        cur.append(c).append(line.charAt(i + 1)); i += 2
      } else if (c == '\t') {
        out += cur.toString; cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.map(v => if (v == "\\N") null else v).toArray
  }

  /** COPY text escapes → bytes-true string (backslash, \b \f \n \r \t
    * \v, octal \ddd). */
  private[graft] def unescapeCopy(v: String): String = {
    if (v.indexOf('\\') < 0) return v
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' && i + 1 < v.length) {
        val n = v.charAt(i + 1)
        n match {
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'v' => sb.append('\u000b'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case d if d >= '0' && d <= '7' =>
            // r20 (r19 ADVICE): each \ddd escape is one BYTE, and a
            // multi-byte UTF-8 character arrives as CONSECUTIVE octal
            // escapes — collect the whole run of \ddd bytes and decode
            // them as one UTF-8 sequence (code.toChar would have treated
            // each byte as a UTF-16 code unit: mojibake). COPY TO text
            // never emits octal itself, but COPY-format content is the
            // decoder's contract, not one producer's habit.
            val bytes = new java.io.ByteArrayOutputStream(8)
            var k = i
            var run = true
            while (run && k + 1 < v.length && v.charAt(k) == '\\' &&
                v.charAt(k + 1) >= '0' && v.charAt(k + 1) <= '7') {
              var j = k + 1
              var code = 0
              while (j < v.length && j < k + 4 &&
                  v.charAt(j) >= '0' && v.charAt(j) <= '7') {
                code = code * 8 + (v.charAt(j) - '0'); j += 1
              }
              bytes.write(code)
              k = j
              run = k + 1 < v.length && v.charAt(k) == '\\' &&
                v.charAt(k + 1) >= '0' && v.charAt(k + 1) <= '7'
            }
            sb.append(new String(bytes.toByteArray, UTF_8)); i = k
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Per-field text → Catalyst external value, by DECLARED Spark type
    * (the VerA contract: schemas are declared, never inferred). */
  private[graft] def parseValue(raw: String, dt: DataType): Any = {
    if (raw == null) return null
    dt match {
      case BooleanType => raw == "t"
      case IntegerType => unescapeCopy(raw).trim.toInt
      case LongType => unescapeCopy(raw).trim.toLong
      case DoubleType => unescapeCopy(raw).trim.toDouble
      case StringType => unescapeCopy(raw)
      case BinaryType =>
        val s = unescapeCopy(raw)
        require(s.startsWith("\\x"), s"pgwire: expected hex bytea, got: $s")
        val hex = s.substring(2)
        val b = new Array[Byte](hex.length / 2)
        var i = 0
        while (i < b.length) {
          b(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
          i += 1
        }
        b
      case TimestampNTZType =>
        // "2023-01-15 10:23:45[.ffffff]" — naive, exactly the tz-less
        // layout the VerA contract stores (Normalize strips zones)
        java.time.LocalDateTime.parse(
          unescapeCopy(raw).replace(' ', 'T'))
      case other =>
        throw new IllegalArgumentException(
          s"Type not supported: $other") // the closed VerA vocabulary
    }
  }

  // ------------------------------------------------------- Spark source

  /** Range-partitioned parallel scan — the [[Jdbc.scan]] twin over the
    * wire protocol. Partition predicates mirror Spark's JDBC source:
    * stride slices of [lowerBound, upperBound), first slice taking
    * everything below (and NULL keys), last everything above. OFFSET
    * (S2) wraps the relation exactly like the JDBC leg's subquery.
    */
  def scan(
      spark: SparkSession,
      host: String, port: Int, db: String, dbUser: String,
      schemaName: String,
      cfg: TableConfig,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L,
      upperBound: Long = 0L,
      numPartitions: Int = 1,
      offset: Option[Long] = None): DataFrame = {
    val relation = offset match {
      case Some(n) =>
        s"(SELECT * FROM $schemaName.${cfg.name} OFFSET $n) _o"
      case None => s"$schemaName.${cfg.name}"
    }
    val colList = cfg.schema.fields.map(_.name).mkString(", ")
    val preds: Seq[Option[String]] = partitionColumn match {
      case Some(c) if numPartitions > 1 && upperBound > lowerBound =>
        val stride = math.max(1L, (upperBound - lowerBound) / numPartitions)
        (0 until numPartitions).map { i =>
          val lo = lowerBound + i * stride
          val hi = lowerBound + (i + 1) * stride
          if (i == 0) Some(s"$c < $hi OR $c IS NULL")
          else if (i == numPartitions - 1) Some(s"$c >= $lo")
          else Some(s"$c >= $lo AND $c < $hi")
        }
      case _ => Seq(None)
    }
    val sqls = preds.map {
      case Some(p) => s"SELECT $colList FROM $relation WHERE $p"
      case None => s"SELECT $colList FROM $relation"
    }
    val schema = cfg.schema
    val types = schema.fields.map(_.dataType)
    val rdd = spark.sparkContext
      .parallelize(sqls, math.max(1, sqls.size))
      .mapPartitions { it =>
        it.flatMap { sql =>
          val conn = new Conn(host, port, db, dbUser)
          // r20 (r19 ADVICE): full-consumption close alone leaks the
          // socket when Spark stops pulling early (limit/take, task kill,
          // a parse exception mid-stream) — a task-completion listener
          // closes unconditionally on success, failure, AND interruption;
          // the eager close below still releases the socket at exhaustion
          // without waiting for task end (close is idempotent)
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => conn.close()))
          val rows = conn.copyOut(sql)
          new Iterator[Row] {
            def hasNext: Boolean = {
              val h = rows.hasNext
              if (!h) conn.close()
              h
            }
            def next(): Row = {
              val raw = rows.next()
              require(raw.length == types.length,
                s"pgwire: ${raw.length} fields, expected ${types.length}")
              Row.fromSeq(Array.tabulate(types.length)(i =>
                parseValue(raw(i), types(i))))
            }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Driver-side MIN/MAX of a partition column (the bounds [[scan]]
    * needs), one tiny aggregate query — never a row scan. */
  def bounds(host: String, port: Int, db: String, dbUser: String,
      schemaName: String, table: String, column: String): (Long, Long) = {
    val conn = new Conn(host, port, db, dbUser)
    try {
      val lo = conn.scalar(
        s"SELECT min($column)::text FROM $schemaName.$table")
      val hi = conn.scalar(
        s"SELECT max($column)::text FROM $schemaName.$table")
      (lo.map(_.toLong).getOrElse(0L), hi.map(_.toLong).getOrElse(0L))
    } finally conn.close()
  }
}
