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
    /** Keyed idempotent UPSERT of one row — the serving-layer maintenance
      * statement whose syntax genuinely differs per engine — rendered as a
      * PREPARED statement: SQL with `?` placeholders plus the column-name
      * BIND ORDER (names may repeat — Derby's MERGE references the key
      * values in its ON clause and every value again in the INSERT arm).
      * VALUES never splice into the SQL text: a name like O'Brien must
      * neither break the statement nor open an injection seam the moment
      * a value stops being a code-level literal. Identifiers (table /
      * column names) remain code-level constants by contract. */
    def upsertSql(table: String, keyCols: Seq[String],
                  colNames: Seq[String]): (String, Seq[String])
  }

  /** The reference deployment's target (`JdbcProvisioner.scala:21`):
    * `INSERT … ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c`.
    * Binds once per column, in declaration order. */
  case object Postgres extends Dialect {
    val name = "postgresql"
    def upsertSql(table: String, keyCols: Seq[String],
                  colNames: Seq[String]): (String, Seq[String]) = {
      val sets = colNames.filterNot(keyCols.contains)
        .map(c => s"$c = EXCLUDED.$c").mkString(", ")
      (s"INSERT INTO $table (${colNames.mkString(", ")}) " +
        s"VALUES (${colNames.map(_ => "?").mkString(", ")}) " +
        s"ON CONFLICT (${keyCols.mkString(", ")}) DO UPDATE SET $sets",
        colNames)
    }
  }

  /** The embedded engine the offline spec matrix executes against
    * (ships in the Spark distribution's own jars): `MERGE INTO` over the
    * one-row SYSIBM.SYSDUMMY1 catalog table — Derby (≥ 10.11) restricts a
    * MERGE source to a base table or table function, so the Postgres-style
    * row-constructor source is exactly the kind of divergence this seam
    * exists to pin. Binds keys (ON clause), then non-keys (UPDATE arm),
    * then every column again (INSERT arm). */
  case object Derby extends Dialect {
    val name = "derby"
    def upsertSql(table: String, keyCols: Seq[String],
                  colNames: Seq[String]): (String, Seq[String]) = {
      val nonKeys = colNames.filterNot(keyCols.contains)
      val on = keyCols.map(k => s"t.$k = ?").mkString(" AND ")
      val sets = nonKeys.map(c => s"t.$c = ?").mkString(", ")
      (s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON $on " +
        s"WHEN MATCHED THEN UPDATE SET $sets " +
        s"WHEN NOT MATCHED THEN INSERT (${colNames.mkString(", ")}) " +
        s"VALUES (${colNames.map(_ => "?").mkString(", ")})",
        keyCols ++ nonKeys ++ colNames)
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
    * reference re-INSERTs unconditionally and duplicates on re-run).
    * One PreparedStatement, values bound per row — never spliced into
    * the SQL text (quoting-safe: O'Brien seeds fine; and seed values
    * that one day come from data instead of code stop being an
    * injection vector). */
  def seedIfEmpty(conn: Connection, table: String, colNames: Seq[String],
                  rows: Seq[Seq[Any]]): Unit = {
    val st = conn.createStatement()
    val n = try {
      val rs = st.executeQuery(s"SELECT COUNT(*) FROM $table")
      try { rs.next(); rs.getLong(1) } finally rs.close()
    } finally st.close()
    if (n == 0) {
      val ps = conn.prepareStatement(
        s"INSERT INTO $table (${colNames.mkString(", ")}) " +
          s"VALUES (${colNames.map(_ => "?").mkString(", ")})")
      try rows.foreach { r =>
        require(r.length == colNames.length, "row arity != column arity")
        r.zipWithIndex.foreach { case (v, i) =>
          ps.setObject(i + 1, v.asInstanceOf[AnyRef])
        }
        ps.executeUpdate()
      } finally ps.close()
    }
  }

  /** Execute the dialect's keyed UPSERT for one row, binding values
    * through the dialect's declared order (see [[Dialect.upsertSql]]). */
  def upsert(conn: Connection, dialect: Dialect, table: String,
             keyCols: Seq[String], cols: Seq[(String, Any)]): Unit = {
    val (sql, bindOrder) = dialect.upsertSql(table, keyCols, cols.map(_._1))
    val byName = cols.toMap
    val ps = conn.prepareStatement(sql)
    try {
      bindOrder.zipWithIndex.foreach { case (c, i) =>
        ps.setObject(i + 1, byName(c).asInstanceOf[AnyRef])
      }
      ps.execute()
    } finally ps.close()
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
      seedIfEmpty(conn, "user_metadata", Seq("id", "name", "email", "quota"),
        seed.map { case (id, nm, em, q) => Seq[Any](id, nm, em, q) })
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
