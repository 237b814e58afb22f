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
  *
  * DIALECT SEAM: Spark's own JDBC source/sink routes its type mapping
  * through the built-in `JdbcDialect` registry, but the provisioner's DDL
  * is hand-written SQL Spark never sees — so the engine-specific surface
  * lives in [[Provisioner.Dialect]], with the two deployments this engine
  * targets made explicit: [[Provisioner.Postgres]] (the reference's
  * serving DB, `JdbcProvisioner.scala:21`) and [[Provisioner.Derby]] (the
  * embedded engine the offline spec matrix runs for real). The divergent
  * surface is deliberately tiny — column-type DDL and the keyed-UPSERT
  * statement; everything else (metadata probes, INSERT, COUNT) is
  * portable SQL-92.
  */
object Provisioner {

  /** Engine-specific SQL for the raw-JDBC layer. Defaults are the
    * portable SQL-92 forms; members exist precisely where Postgres and
    * Derby diverge. */
  sealed trait Dialect {
    def name: String
    def varcharDdl(n: Int): String = s"VARCHAR($n)"
    def bigintDdl: String = "BIGINT"
    def timestampDdl: String = "TIMESTAMP"
    /** Catalog foldings an unquoted identifier may appear under in
      * DatabaseMetaData (Derby/Oracle fold UP, Postgres folds DOWN —
      * probing both is portable). */
    def identifierFolds(id: String): Seq[String] =
      Seq(id.toUpperCase, id.toLowerCase)
    /** Keyed idempotent UPSERT of one literal row — the serving-layer
      * maintenance statement whose syntax genuinely differs per engine.
      * `cols` lists (name, literal) pairs; `keyCols` ⊆ the col names. */
    def upsertSql(table: String, keyCols: Seq[String],
                  cols: Seq[(String, String)]): String
  }

  /** The reference deployment's target (`JdbcProvisioner.scala:21`):
    * `INSERT … ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c`. */
  case object Postgres extends Dialect {
    val name = "postgresql"
    def upsertSql(table: String, keyCols: Seq[String],
                  cols: Seq[(String, String)]): String = {
      val names = cols.map(_._1)
      val sets = names.filterNot(keyCols.contains)
        .map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"INSERT INTO $table (${names.mkString(", ")}) " +
        s"VALUES (${cols.map(_._2).mkString(", ")}) " +
        s"ON CONFLICT (${keyCols.mkString(", ")}) DO UPDATE SET $sets"
    }
  }

  /** The embedded engine the offline spec matrix executes against
    * (ships in the Spark distribution's own jars): `MERGE INTO` over the
    * one-row SYSIBM.SYSDUMMY1 catalog table with inline literals — Derby
    * (≥ 10.11) restricts a MERGE source to a base table or table
    * function, so the Postgres-style row-constructor source is exactly
    * the kind of divergence this seam exists to pin. */
  case object Derby extends Dialect {
    val name = "derby"
    def upsertSql(table: String, keyCols: Seq[String],
                  cols: Seq[(String, String)]): String = {
      val lit = cols.toMap
      val names = cols.map(_._1)
      val on = keyCols.map(k => s"t.$k = ${lit(k)}").mkString(" AND ")
      val sets = names.filterNot(keyCols.contains)
        .map(c => s"t.$c = ${lit(c)}").mkString(", ")
      s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON $on " +
        s"WHEN MATCHED THEN UPDATE SET $sets " +
        s"WHEN NOT MATCHED THEN INSERT (${names.mkString(", ")}) " +
        s"VALUES (${cols.map(_._2).mkString(", ")})"
    }
  }

  def withConnection[A](url: String, user: String, password: String)
                       (f: Connection => A): A = {
    val conn = DriverManager.getConnection(url, user, password)
    try f(conn) finally conn.close()
  }

  /** CREATE TABLE if absent; no-op when present (probes every fold the
    * dialect's catalog may store an unquoted identifier under). */
  def ensureTable(conn: Connection, table: String, columnsDdl: String,
                  dialect: Dialect = Derby): Unit = {
    val md = conn.getMetaData
    def exists(n: String) = {
      val rs = md.getTables(null, null, n, Array("TABLE"))
      try rs.next() finally rs.close()
    }
    if (!dialect.identifierFolds(table).exists(exists)) {
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

  /** Execute the dialect's keyed UPSERT for one literal row. */
  def upsert(conn: Connection, dialect: Dialect, table: String,
             keyCols: Seq[String], cols: Seq[(String, String)]): Unit = {
    val st = conn.createStatement()
    try st.execute(dialect.upsertSql(table, keyCols, cols))
    finally st.close()
  }

  /** The reference deployment's full shape: user dimension (+seed) and the
    * three pipeline output tables, against any JDBC database. Column-type
    * DDL routes through the dialect seam so the Derby-vs-Postgres mapping
    * is explicit (JdbcSpec's dialect matrix pins both renderings; the
    * Derby row executes for real against the embedded engine). */
  def provisionPipeline(url: String, user: String, password: String,
                        seed: Seq[(String, String, String, Long)],
                        dialect: Dialect = Derby): Unit =
    withConnection(url, user, password) { conn =>
      val d = dialect
      ensureTable(conn, "user_metadata",
        s"id ${d.varcharDdl(64)}, name ${d.varcharDdl(256)}, " +
          s"email ${d.varcharDdl(256)}, quota ${d.bigintDdl}", d)
      seedIfEmpty(conn, "user_metadata", seed.map { case (id, nm, em, q) =>
        s"INSERT INTO user_metadata (id, name, email, quota) " +
          s"VALUES ('$id', '$nm', '$em', $q)"
      })
      ensureTable(conn, "bytes",
        s"ts ${d.timestampDdl}, id ${d.varcharDdl(64)}, " +
          s"value ${d.bigintDdl}, type ${d.varcharDdl(32)}", d)
      ensureTable(conn, "bytes_hourly",
        s"ts ${d.timestampDdl}, id ${d.varcharDdl(64)}, " +
          s"value ${d.bigintDdl}, type ${d.varcharDdl(32)}", d)
      ensureTable(conn, "user_quota_limit",
        s"email ${d.varcharDdl(256)}, usage_b ${d.bigintDdl}, " +
          s"quota ${d.bigintDdl}, ts ${d.timestampDdl}", d)
    }
}
