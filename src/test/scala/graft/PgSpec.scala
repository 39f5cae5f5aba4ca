package graft

import graft.vera._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll

import java.nio.file.{Files, Paths}

/** The reference's literal core scenario (`main.py:197-207`) against a
  * REAL PostgreSQL 15 server, with no driver jar: the wire-protocol
  * source [[PgWire]] scans range-partitioned `COPY TO STDOUT` slices →
  * [[Normalize]] → [[Export]] — the same chain JdbcSpec proves on
  * embedded Derby, now on the engine the reference actually targets.
  *
  * The suite manages its own throwaway cluster (initdb + pg_ctl under the
  * `postgres` OS user, trust auth, loopback only) and cancels cleanly via
  * `assume` when the server binaries are absent — the environment-bound
  * posture every round's §9 probe records.
  */
class PgSpec extends SparkSpec with BeforeAndAfterAll {

  private val dataDir = "/tmp/graft_pgspec"
  private val port = 54397
  private val db = "postgres"
  private val dbUser = "graft"

  private def sh(cmd: String): (Int, String) = {
    val pb = new ProcessBuilder("su", "postgres", "-c", cmd)
    pb.directory(new java.io.File("/tmp"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    (p.waitFor(), out)
  }

  private lazy val serverUp: Boolean = {
    val haveBinaries = Files.exists(Paths.get("/usr/local/bin/initdb")) &&
      Files.exists(Paths.get("/usr/local/bin/pg_ctl"))
    haveBinaries && {
      sh(s"pg_ctl -D $dataDir -m immediate stop; rm -rf $dataDir")
      val (c1, o1) = sh(s"initdb -D $dataDir -A trust -U $dbUser")
      val (c2, o2) = sh(s"pg_ctl -D $dataDir -l $dataDir/log " +
        s"-o '-p $port -k $dataDir -c listen_addresses=127.0.0.1' -w start")
      if (c1 != 0 || c2 != 0)
        info(s"postgres unavailable (initdb=$c1 pg_ctl=$c2): " +
          (o1 + o2).linesIterator.take(3).mkString(" | "))
      c1 == 0 && c2 == 0
    }
  }

  override def afterAll(): Unit = {
    sh(s"pg_ctl -D $dataDir -m immediate stop; rm -rf $dataDir")
    super.afterAll()
  }

  private def conn() = new PgWire.Conn("127.0.0.1", port, db, dbUser)

  test("COPY text decoding: tab split, \\N vs empty string, backslash " +
      "escapes, octal, bytea hex — the pure layer, no server needed") {
    assert(PgWire.splitCopyLine("a\tb\tc").toSeq === Seq("a", "b", "c"))
    assert(PgWire.splitCopyLine("a\t\\N\t").toSeq === Seq("a", null, ""))
    // an ESCAPED tab stays inside its field; a literal backslash-N is not null
    assert(PgWire.splitCopyLine("x\\ty\tz").toSeq === Seq("x\\ty", "z"))
    assert(PgWire.splitCopyLine("\\\\N").toSeq === Seq("\\\\N"))
    assert(PgWire.unescapeCopy("x\\ty") === "x\ty")
    assert(PgWire.unescapeCopy("a\\nb\\rc\\\\d") === "a\nb\rc\\d")
    assert(PgWire.unescapeCopy("\\\\N") === "\\N") // content, not SQL NULL
    assert(PgWire.unescapeCopy("\\101\\12") === "A\n") // octal
    // r20: octal escapes are BYTES — a multi-byte UTF-8 char arriving as
    // consecutive \ddd escapes must decode as one sequence (é = C3 A9;
    // the per-escape toChar route produced mojibake Ã©)
    assert(PgWire.unescapeCopy("\\303\\251") === "é")
    assert(PgWire.unescapeCopy("a\\303\\251b\\tc") === "aéb\tc")
    assert(PgWire.parseValue("t", BooleanType) === true)
    assert(PgWire.parseValue("f", BooleanType) === false)
    assert(PgWire.parseValue("-42", IntegerType) === -42)
    assert(PgWire.parseValue("9007199254740993", LongType) === 9007199254740993L)
    assert(PgWire.parseValue("\\\\x00ff10", BinaryType)
      .asInstanceOf[Array[Byte]].toSeq === Seq[Byte](0, -1, 16))
    assert(PgWire.parseValue("2024-06-01 12:00:07.123456", TimestampNTZType)
      === java.time.LocalDateTime.parse("2024-06-01T12:00:07.123456"))
    assert(PgWire.parseValue(null, StringType) === null)
  }

  test("wire client against a live server: startup (trust), DDL + INSERT " +
      "via simple query, describe, scalar") {
    assume(serverUp, "postgres binaries/cluster unavailable")
    val c = conn()
    try {
      c.exec("DROP TABLE IF EXISTS wiretest")
      c.exec("CREATE TABLE wiretest(id bigint, note text)")
      c.exec("INSERT INTO wiretest VALUES (1, 'hi'), (2, NULL), (3, 'x')")
      assert(c.scalar("SELECT count(*)::text FROM wiretest") === Some("3"))
      assert(c.scalar("SELECT note FROM wiretest WHERE id = 2") === None)
      val cols = c.describe("SELECT * FROM wiretest")
      assert(cols.map(_._1) === Seq("id", "note"))
      assert(cols.map(_._2) === Seq(20, 25)) // int8, text OIDs
      // an error mid-session leaves the connection usable (ReadyForQuery)
      val ex = intercept[RuntimeException] { c.exec("SELECT nonsense!!") }
      assert(ex.getMessage.contains("pgwire"))
      assert(c.scalar("SELECT 7::text") === Some("7"))
    } finally c.close()
  }

  test("S1 for real: range-partitioned COPY scan of a VerA-shaped table " +
      "-> Normalize -> Export, adversarial content included (newlines, " +
      "tabs, backslashes, unicode, NULL vs empty, bytea, micros, " +
      "byte-preserved JSON)") {
    assume(serverUp, "postgres binaries/cluster unavailable")
    val n = 257
    val c = conn()
    try {
      c.exec("CREATE SCHEMA IF NOT EXISTS vera")
      c.exec("DROP TABLE IF EXISTS vera.accounts")
      c.exec(
        """CREATE TABLE vera.accounts(
          |  id bigint, name text, tag bytea,
          |  created_at timestamp, payload json, active boolean,
          |  small integer)""".stripMargin)
      val rows = (0 until n).map { i =>
        val name =
          if (i == 3) "NULL" // SQL NULL
          else if (i == 4) "''" // empty string — distinct from NULL
          else if (i == 5) "E'line1\\nline2\\ttabbed \\\\slash'"
          else if (i == 6) "'καλημέρα — 多言語'"
          else s"'acct_$i'"
        val tag = if (i == 7) "NULL"
          else f"'\\x${i % 256}%02x${i * 2 % 256}%02x'"
        val ts = if (i == 8) "NULL"
          else f"'2024-06-01 12:00:${i % 60}%02d.12345'"
        val json = s"""'{"i":  $i, "ok": true}'"""
        s"($i, $name, $tag, $ts, $json, " +
          s"${if (i % 2 == 0) "true" else "false"}, ${i * 3})"
      }
      rows.grouped(64).foreach { g =>
        c.exec("INSERT INTO vera.accounts VALUES " + g.mkString(", "))
      }
    } finally c.close()

    val cfg = TableConfig("accounts",
      Schemas.fromDtypes(Seq(
        "id" -> "Int64", "name" -> "string", "tag" -> "object",
        "created_at" -> "datetime64[ns]", "payload" -> "json",
        "active" -> "bool", "small" -> "Int32")),
      chunkSize = 10, numChunksPerFile = 10,
      jsonCols = Set("payload"), compression = None)

    val (lo, hi) = PgWire.bounds("127.0.0.1", port, db, dbUser,
      "vera", "accounts", "id")
    assert((lo, hi) === (0L, (n - 1).toLong))
    val df = PgWire.scan(spark, "127.0.0.1", port, db, dbUser, "vera", cfg,
      partitionColumn = Some("id"), lowerBound = lo, upperBound = hi + 1,
      numPartitions = 4)
    // the ONE sequential reference cursor became N concurrent COPY slices
    assert(df.rdd.getNumPartitions === 4)
    val norm = Normalize(df, cfg)

    val out = Files.createTempDirectory("graft_pg_out").toString
    val files = Export.exportTable(norm, cfg, Seq("id"), out)
    assert(files.map(_.rows).sum === n.toLong)
    assert(files.length === math.ceil(n / 100.0).toInt)

    val back = spark.read.parquet(files.map(f => s"$out/${f.fileName}"): _*)
    assert(back.count() === n.toLong)
    assert(back.schema("created_at").dataType === TimestampNTZType)
    def at(i: Long) = back.filter(col("id") === i).head()
    assert(at(9).getString(1) === "acct_9")
    assert(at(3).isNullAt(1), "SQL NULL must stay NULL")
    assert(at(4).getString(1) === "", "empty string must NOT become NULL")
    assert(at(5).getString(1) === "line1\nline2\ttabbed \\slash")
    assert(at(6).getString(1) === "καλημέρα — 多言語")
    assert(at(7).isNullAt(2))
    assert(at(9).getAs[Array[Byte]]("tag").toSeq ===
      Seq[Byte](9, 18))
    assert(at(8).isNullAt(3))
    assert(at(9).getAs[java.time.LocalDateTime]("created_at").toString
      === "2024-06-01T12:00:09.123450")
    // literal-JSON byte preservation: odd spacing survives the whole chain
    assert(at(11).getString(4) === """{"i":  11, "ok": true}""")
    assert(at(10).getBoolean(5) === true)
    assert(at(11).getBoolean(5) === false)
    assert(at(12).getInt(6) === 36)
  }

  test("OFFSET (S2) pushes into the COPY subquery server-side") {
    assume(serverUp, "postgres binaries/cluster unavailable")
    val cfg = TableConfig("accounts",
      Schemas.fromDtypes(Seq("id" -> "Int64")),
      chunkSize = 10, numChunksPerFile = 10, compression = None)
    val df = PgWire.scan(spark, "127.0.0.1", port, db, dbUser, "vera", cfg,
      offset = Some(250L))
    assert(df.count() === 7L) // 257 - 250
  }

  test("the full 7-table VerA catalog loads from the live server and " +
      "exports end-to-end (runFromEnv shape: per-table scan -> normalize " +
      "-> manifest)") {
    assume(serverUp, "postgres binaries/cluster unavailable")
    def pgType(dt: DataType): String = dt match {
      case BooleanType => "boolean"
      case IntegerType => "integer"
      case LongType => "bigint"
      case BinaryType => "bytea"
      case TimestampNTZType => "timestamp"
      case StringType => "text"
      case other => fail(s"unexpected VerA type $other")
    }
    def lit(dt: DataType, tbl: String, cn: String, i: Int): String = dt match {
      case BooleanType => if (i % 2 == 0) "true" else "false"
      case IntegerType => (i * 7).toString
      case LongType => (i * 1000L + tbl.length).toString
      case BinaryType => f"'\\x0$i%x7f'"
      case TimestampNTZType => s"'2024-03-0${i + 1} 08:15:3$i'"
      case StringType => s"'${tbl}_${cn}_$i'"
    }
    val c = conn()
    try {
      c.exec("CREATE SCHEMA IF NOT EXISTS vera7")
      for (cfg <- Schemas.tables) {
        c.exec(s"DROP TABLE IF EXISTS vera7.${cfg.name}")
        val cols = cfg.schema.fields.map { f =>
          val t = if (cfg.jsonCols(f.name)) "json" else pgType(f.dataType)
          s"${f.name} $t"
        }.mkString(", ")
        c.exec(s"CREATE TABLE vera7.${cfg.name}($cols)")
        val inserts = (0 until 3).map { i =>
          cfg.schema.fields.map { f =>
            if (cfg.jsonCols(f.name)) s"""'{"k": $i}'"""
            else lit(f.dataType, cfg.name, f.name, i)
          }.mkString("(", ", ", ")")
        }
        c.exec(s"INSERT INTO vera7.${cfg.name} VALUES " +
          inserts.mkString(", "))
      }
    } finally c.close()

    val out = Files.createTempDirectory("graft_pg7_out").toString
    val manifest = Export.runFromEnv(
      source = cfg => Normalize(
        PgWire.scan(spark, "127.0.0.1", port, db, dbUser, "vera7", cfg),
        cfg),
      orderBy = cfg => Seq(cfg.schema.fields.head.name),
      outDir = out,
      env = Map.empty)
    val byTable = manifest.files.toMap
    assert(byTable.keySet === Schemas.tables.map(_.name).toSet)
    for (cfg <- Schemas.tables) {
      // object keys are "{table}/{fileName}"; files land at outDir/fileName
      val back = spark.read.parquet(
        byTable(cfg.name).map(k => s"$out/${k.split('/').last}"): _*)
      assert(back.schema === cfg.schema, s"${cfg.name} schema drift")
      assert(back.count() === 3L, s"${cfg.name} row count")
    }
  }
}
