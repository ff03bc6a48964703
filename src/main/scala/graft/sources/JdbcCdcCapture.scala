package graft.sources

import java.sql.{Connection, DriverManager, Types}

/** Trigger-log CDC capture from a live JDBC database into Debezium-shaped
  * JSON segments — the self-contained stand-in for the reference's DMS →
  * Kinesis leg (`lib/rds-cdc-flink-hudi-stack.ts:180-240`: per-table
  * replication tasks off Postgres logical decoding). Where the reference
  * leans on the database's WAL, this agent installs the classic
  * trigger-audit pattern (the portable CDC fallback DMS itself offers for
  * engines without a readable log):
  *
  *  1. [[install]] creates, per captured table, a `<table>_cdclog` audit
  *     table (monotone `logid` identity + op + full before/after images —
  *     REPLICA IDENTITY FULL semantics) and AFTER INSERT/UPDATE/DELETE
  *     row triggers that populate it inside the writer's own transaction
  *     (so the log is exactly the committed change stream, never a dirty
  *     read).
  *  2. [[drainSegment]] polls every log past the last drained `logid`,
  *     serializes the rows as Debezium `payload` envelopes (op c/u/d,
  *     before/after, `source.table`, a drain-assigned monotone `lsn`),
  *     and publishes ONE JSON-line segment file — written to a temp name
  *     and atomically renamed into the watch directory, so a tailing
  *     `readStream` ([[DebeziumSource.streamJsonDir]]) never observes a
  *     half-written segment.
  *
  * Scale shape: the drain moves O(new changes) rows per poll through one
  * JDBC cursor per table; segment files batch them for the stream's
  * maxFilesPerTrigger cadence (the 1-minute checkpoint cadence of
  * zpln:131). Capture state (per-table high-water `logid`, the global
  * `lsn` counter) lives in this agent instance, the same placement as a
  * Debezium connector's offset store.
  *
  * Ordering contract: `lsn` is strictly monotone over drained rows,
  * ordered by (capture timestamp, table, logid). Per (table, key) this
  * preserves commit order (logids are assigned in trigger firing order);
  * ACROSS tables inside one transaction it may group rather than
  * interleave — exactly-once per-key semantics downstream are unaffected
  * because the pipeline applies a micro-batch's per-table deltas
  * atomically. Timestamp columns serialize as epoch millis (LongType in
  * the merged wire schema). */
final class JdbcCdcCapture(url: String, tables: Seq[String]) {

  private final case class Col(name: String, sqlType: Int, typeDdl: String)

  private val columns: Map[String, Seq[Col]] = {
    val conn = DriverManager.getConnection(url)
    try tables.map { t => t -> discoverColumns(conn, t) }.toMap
    finally conn.close()
  }

  private val lastDrained =
    scala.collection.mutable.Map[String, Long](tables.map(_ -> 0L): _*)
  private var lsn = 0L
  private var segmentId = 0L

  private def discoverColumns(conn: Connection, table: String): Seq[Col] = {
    val rs = conn.getMetaData.getColumns(null, null, table.toUpperCase, null)
    val buf = scala.collection.mutable.ArrayBuffer[Col]()
    while (rs.next()) {
      val name = rs.getString("COLUMN_NAME").toLowerCase
      val sqlType = rs.getInt("DATA_TYPE")
      val typeName = rs.getString("TYPE_NAME")
      val size = rs.getInt("COLUMN_SIZE")
      val ddl = sqlType match {
        case Types.VARCHAR | Types.CHAR => s"$typeName($size)"
        case _ => typeName
      }
      buf += Col(name, sqlType, ddl)
    }
    require(buf.nonEmpty, s"cdc capture: table $table not found via JDBC metadata")
    buf.toSeq
  }

  /** Create the audit log tables and row triggers. Call once per database;
    * changes BEFORE install are the snapshot's job (snapshot→binlog mode). */
  def install(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      tables.foreach { t =>
        val cols = columns(t)
        val imageCols = cols.flatMap(c =>
          Seq(s"old_${c.name} ${c.typeDdl}", s"new_${c.name} ${c.typeDdl}"))
        st.execute(
          s"""CREATE TABLE ${t}_cdclog (
             |  logid BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
             |  op CHAR(1) NOT NULL,
             |  ts TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP,
             |  ${imageCols.mkString(",\n  ")})""".stripMargin)
        val names = cols.map(_.name)
        st.execute(
          s"CREATE TRIGGER ${t}_cdc_i AFTER INSERT ON $t REFERENCING NEW AS N " +
            s"FOR EACH ROW INSERT INTO ${t}_cdclog (op, ${names.map("new_" + _).mkString(", ")}) " +
            s"VALUES ('c', ${names.map("N." + _).mkString(", ")})")
        st.execute(
          s"CREATE TRIGGER ${t}_cdc_u AFTER UPDATE ON $t REFERENCING OLD AS O NEW AS N " +
            s"FOR EACH ROW INSERT INTO ${t}_cdclog (op, " +
            s"${names.map("old_" + _).mkString(", ")}, ${names.map("new_" + _).mkString(", ")}) " +
            s"VALUES ('u', ${names.map("O." + _).mkString(", ")}, ${names.map("N." + _).mkString(", ")})")
        st.execute(
          s"CREATE TRIGGER ${t}_cdc_d AFTER DELETE ON $t REFERENCING OLD AS O " +
            s"FOR EACH ROW INSERT INTO ${t}_cdclog (op, ${names.map("old_" + _).mkString(", ")}) " +
            s"VALUES ('d', ${names.map("O." + _).mkString(", ")})")
      }
    } finally conn.close()
  }

  /** Drain every captured table's new log rows into one Debezium JSON-line
    * segment in `watchDir`. Returns the number of change events published
    * (0 = no segment written). */
  def drainSegment(watchDir: String): Int = {
    final case class Event(tsMs: Long, table: String, logid: Long,
                           op: String, before: String, after: String)
    val conn = DriverManager.getConnection(url)
    val drained = scala.collection.mutable.ArrayBuffer[Event]()
    // tentative high-water marks: committed to lastDrained only AFTER the
    // segment rename succeeds — advancing mid-cursor would permanently skip
    // the read-but-unpublished logids if the segment write failed
    // (at-most-once), breaking the Debezium offset-after-publish contract
    val tentative = scala.collection.mutable.Map[String, Long]()
    try {
      tables.foreach { t =>
        val cols = columns(t)
        val st = conn.prepareStatement(
          s"SELECT * FROM ${t}_cdclog WHERE logid > ? ORDER BY logid")
        st.setLong(1, lastDrained(t))
        val rs = st.executeQuery()
        while (rs.next()) {
          val logid = rs.getLong("logid")
          val op = rs.getString("op").trim
          val before = if (op == "c") "null" else imageJson(rs, cols, "old_")
          val after = if (op == "d") "null" else imageJson(rs, cols, "new_")
          drained += Event(rs.getTimestamp("ts").getTime, t, logid, op, before, after)
          tentative(t) = math.max(tentative.getOrElse(t, lastDrained(t)), logid)
        }
      }
    } finally conn.close()
    if (drained.isEmpty) return 0
    val lines = drained.sortBy(e => (e.tsMs, e.table, e.logid))
      .map { e =>
        lsn += 1
        s"""{"payload":{"op":"${e.op}","before":${e.before},"after":${e.after},""" +
          s""""source":{"table":"${e.table}","lsn":$lsn,"ts_ms":${e.tsMs}}}}"""
      }
    segmentId += 1
    val dir = java.nio.file.Paths.get(watchDir)
    java.nio.file.Files.createDirectories(dir)
    val tmp = dir.resolve(s".seg-$segmentId.json.tmp")
    java.nio.file.Files.write(tmp,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, dir.resolve(s"seg-$segmentId.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    tentative.foreach { case (t, hw) => lastDrained(t) = hw } // publish durable → commit offsets
    lines.size
  }

  /** One before/after image as a JSON object (keys = raw column names). */
  private def imageJson(rs: java.sql.ResultSet, cols: Seq[Col], prefix: String): String = {
    val fields = cols.map { c =>
      val v: String = c.sqlType match {
        case Types.TIMESTAMP =>
          val ts = rs.getTimestamp(s"$prefix${c.name}")
          if (rs.wasNull() || ts == null) "null" else ts.getTime.toString
        case Types.DOUBLE | Types.FLOAT | Types.REAL | Types.DECIMAL | Types.NUMERIC =>
          val d = rs.getDouble(s"$prefix${c.name}")
          if (rs.wasNull()) "null" else d.toString
        case Types.BIGINT | Types.INTEGER | Types.SMALLINT | Types.TINYINT =>
          val l = rs.getLong(s"$prefix${c.name}")
          if (rs.wasNull()) "null" else l.toString
        case _ =>
          val s = rs.getString(s"$prefix${c.name}")
          if (rs.wasNull() || s == null) "null" else jsonString(s)
      }
      s""""${c.name}":$v"""
    }
    // an all-null old_ image on a 'c' row never reaches here (before=null
    // short-circuits in drainSegment), so this is always a real image
    fields.mkString("{", ",", "}")
  }

  /** JSON string literal with FULL control-character escaping — a raw
    * newline in a VARCHAR would split one event across two JSON lines and
    * permissive-mode parsing downstream would silently null both. */
  private def jsonString(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 2)
    b.append('"')
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      ch match {
        case '\\' => b.append("\\\\")
        case '"' => b.append("\\\"")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      i += 1
    }
    b.append('"')
    b.toString
  }
}
