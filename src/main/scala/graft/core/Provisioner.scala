package graft.core

import java.sql.{Connection, DriverManager}

/** K4: the non-Spark JDBC provisioner — plain-JDBC DDL + seed that runs
  * BEFORE any Spark job so the serving database has the dimension table
  * and the sink tables the pipeline expects (reference
  * `JdbcProvisioner.scala:7-64`: `user_metadata` + seed rows, then empty
  * `bytes`/`bytes_hourly`/`user_quota_limit` output tables; hardwired
  * Postgres there, parameterized here). Provisioning is driver-side BY
  * DESIGN — it is O(#tables) DDL, not data movement; data flows only
  * through the Spark JDBC source/sink ([[Tables.jdbcTable]],
  * [[Sinks.writeToJdbc]]).
  *
  * Idempotent: `ensureTable` treats "already exists" as success (the
  * reference gets this only for its first table via IF NOT EXISTS — Derby
  * has no IF NOT EXISTS, so existence is probed through DatabaseMetaData,
  * which is dialect-portable). Re-running the provisioner is a no-op, the
  * at-least-once deployment contract.
  */
object Provisioner {

  def withConnection[A](url: String, user: String, password: String)
                       (f: Connection => A): A = {
    val conn = DriverManager.getConnection(url, user, password)
    try f(conn) finally conn.close()
  }

  /** CREATE TABLE if absent; no-op when present (case-insensitive probe —
    * unquoted identifiers fold, to upper in Derby/Oracle, lower in
    * Postgres). */
  def ensureTable(conn: Connection, table: String, columnsDdl: String): Unit = {
    val md = conn.getMetaData
    def exists(n: String) = {
      val rs = md.getTables(null, null, n, Array("TABLE"))
      try rs.next() finally rs.close()
    }
    if (!exists(table.toUpperCase) && !exists(table.toLowerCase)) {
      val st = conn.createStatement()
      try st.execute(s"CREATE TABLE $table ($columnsDdl)") finally st.close()
    }
  }

  /** Idempotent seed: INSERT rows only when the table is empty (the
    * reference re-INSERTs unconditionally and duplicates on re-run). */
  def seedIfEmpty(conn: Connection, table: String, insertSql: Seq[String]): Unit = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"SELECT COUNT(*) FROM $table")
      val n = try { rs.next(); rs.getLong(1) } finally rs.close()
      if (n == 0) insertSql.foreach(st.execute)
    } finally st.close()
  }

  /** The reference deployment's full shape: user dimension (+seed) and the
    * three pipeline output tables, against any JDBC database. */
  def provisionPipeline(url: String, user: String, password: String,
                        seed: Seq[(String, String, String, Long)]): Unit =
    withConnection(url, user, password) { conn =>
      ensureTable(conn, "user_metadata",
        "id VARCHAR(64), name VARCHAR(256), email VARCHAR(256), quota BIGINT")
      seedIfEmpty(conn, "user_metadata", seed.map { case (id, nm, em, q) =>
        s"INSERT INTO user_metadata (id, name, email, quota) " +
          s"VALUES ('$id', '$nm', '$em', $q)"
      })
      ensureTable(conn, "bytes",
        "ts TIMESTAMP, id VARCHAR(64), value BIGINT, type VARCHAR(32)")
      ensureTable(conn, "bytes_hourly",
        "ts TIMESTAMP, id VARCHAR(64), value BIGINT, type VARCHAR(32)")
      ensureTable(conn, "user_quota_limit",
        "email VARCHAR(256), usage_b BIGINT, quota BIGINT, ts TIMESTAMP")
    }
}
