package graft

import graft.vera._
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.DriverManager

/** Executes the S1 JDBC scan path end to end against an EMBEDDED Derby
  * database (Derby ships on the Spark classpath for the Hive metastore, so
  * no new dependency): `Jdbc.scan` with fetchsize + range partitions →
  * [[Normalize]] → [[Export.exportTable]] → parquet round-trip. The
  * production target is Postgres (reference main.py:197-207); Derby proves
  * the `format("jdbc")` plumbing — option wiring, N concurrent range-scan
  * connections, JDBC→Spark type mapping (BIGINT/VARCHAR/VARBINARY/
  * TIMESTAMP) — actually runs, not just compiles.
  *
  * The OFFSET variant (S2) is deliberately NOT driven through Derby: the
  * pushed-down subquery uses Postgres `OFFSET n` syntax, which Derby spells
  * `OFFSET n ROWS`. Offset semantics are covered by q44 on parquet.
  */
class JdbcSpec extends SparkSpec {

  test("S1: embedded-JDBC scan with fetchsize + range partitions feeds export") {
    val dbDir = Files.createTempDirectory("graft_derby").toString + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val n = 257

    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA vera")
      st.execute(
        """CREATE TABLE vera.accounts(
          |  id BIGINT NOT NULL,
          |  name VARCHAR(64),
          |  tag VARCHAR(16) FOR BIT DATA,
          |  created_at TIMESTAMP,
          |  payload VARCHAR(128))""".stripMargin)
      val ps = conn.prepareStatement("INSERT INTO vera.accounts VALUES (?,?,?,?,?)")
      for (i <- 0 until n) {
        ps.setLong(1, i.toLong)
        ps.setString(2, s"acct_$i")
        ps.setBytes(3, Array[Byte](i.toByte, (i >> 4).toByte))
        ps.setTimestamp(4, java.sql.Timestamp.valueOf(s"2024-06-01 12:00:${i % 60}"))
        // literal-JSON column: oddly-spaced payload must survive byte-for-byte
        ps.setString(5, s"""{"i":  $i, "ok": true}""")
        ps.addBatch()
      }
      ps.executeBatch()
      ps.close(); st.close()
    } finally conn.close()

    val cfg = TableConfig("accounts",
      Schemas.fromDtypes(Seq(
        "id" -> "Int64", "name" -> "string", "tag" -> "object",
        "created_at" -> "datetime64[ns]", "payload" -> "json")),
      chunkSize = 10, numChunksPerFile = 10,
      jsonCols = Set("payload"), compression = None)

    val df = Jdbc.scan(spark, url, "vera", cfg, user = "app", password = "",
      partitionColumn = Some("id"), lowerBound = 0L, upperBound = n.toLong,
      numPartitions = 4)
    // the ONE sequential reference cursor became N concurrent range scans
    assert(df.rdd.getNumPartitions === 4)

    val out = Files.createTempDirectory("graft_jdbc_out").toString
    val files = Export.exportTable(df, cfg, Seq("id"), out)
    assert(files.map(_.rows).sum === n.toLong)
    assert(files.length === math.ceil(n / 100.0).toInt)

    val back = spark.read.parquet(files.map(f => s"$out/${f.fileName}"): _*)
    assert(back.count() === n.toLong)
    assert(back.schema("created_at").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val r7 = back.filter(col("id") === 7).head()
    assert(r7.getString(back.schema.fieldIndex("name")) === "acct_7")
    assert(r7.getAs[Array[Byte]]("tag").toSeq === Seq[Byte](7, 0))
    assert(r7.getString(back.schema.fieldIndex("payload")) ===
      """{"i":  7, "ok": true}""")
    assert(r7.getAs[java.time.LocalDateTime]("created_at").toString ===
      "2024-06-01T12:00:07")
  }

  test("incremental delta over JDBC pushes the watermark predicate to the source") {
    val dbDir = Files.createTempDirectory("graft_derby_inc").toString + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val n = 40

    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA vera")
      st.execute(
        """CREATE TABLE vera.versions(
          |  id BIGINT NOT NULL, updated_at TIMESTAMP, v VARCHAR(32))""".stripMargin)
      val ps = conn.prepareStatement("INSERT INTO vera.versions VALUES (?,?,?)")
      for (i <- 0 until n) {
        ps.setLong(1, i.toLong)
        ps.setTimestamp(2, java.sql.Timestamp.valueOf(s"2024-06-01 12:00:${i % 60}"))
        ps.setString(3, s"v$i")
        ps.addBatch()
      }
      ps.executeBatch(); ps.close(); st.close()
    } finally conn.close()

    val cfg = TableConfig("versions",
      Schemas.fromDtypes(Seq(
        "id" -> "Int64", "updated_at" -> "datetime64[ns]", "v" -> "string")),
      chunkSize = 10, numChunksPerFile = 10, compression = None)
    def src = Jdbc.scan(spark, url, "vera", cfg, user = "app", password = "",
      partitionColumn = Some("id"), lowerBound = 0L, upperBound = n.toLong,
      numPartitions = 2)

    val out = Files.createTempDirectory("graft_jdbc_inc_out").toString
    val m1 = Export.exportIncremental(Seq((src, cfg, Seq("id"))), out, 1000L)
    assert(spark.read.parquet(s"$out/run_1000/versions_0_100.parquet")
      .count() === n.toLong)

    // re-version 6 rows in the database, then run the next delta
    val c2 = DriverManager.getConnection(url)
    try {
      val up = c2.prepareStatement(
        "UPDATE vera.versions SET updated_at = ?, v = ? WHERE id < 6")
      up.setTimestamp(1, java.sql.Timestamp.valueOf("2024-07-01 00:00:00"))
      up.setString(2, "renewed")
      up.executeUpdate(); up.close()
    } finally c2.close()
    val m2 = Export.exportIncremental(Seq((src, cfg, Seq("id"))), out, 2000L)
    val delta = spark.read.parquet(s"$out/run_2000/versions_0_100.parquet")
    assert(delta.count() === 6)
    assert(delta.select(col("v")).distinct().head.getString(0) === "renewed")

    // the watermark predicate reaches the JDBC scan as a pushed filter —
    // the delta read is O(changed rows) AT THE SOURCE, not a full scan
    val w = java.time.LocalDateTime.ofEpochSecond(
      m1.watermarkMicros.get / 1000000L, 0, java.time.ZoneOffset.UTC)
    val plan = src.filter(col("updated_at") > lit(java.sql.Timestamp.valueOf(w)))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("pushedfilters") &&
      plan.toLowerCase.contains("greaterthan(updated_at"),
      s"watermark predicate not pushed:\n$plan")

    // snapshot replay over the JDBC-fed chain
    val snap = Export.readSnapshot(out, cfg, Seq("id"), spark)
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap.size === n)
    assert((0L until 6L).forall(i => snap(i) === "renewed"))
    assert(snap(7L) === "v7")
  }
}
