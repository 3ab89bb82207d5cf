package graft.ingest

import java.sql.{Connection, DriverManager}
import java.util.Properties
import org.apache.spark.sql.DataFrame
import scala.util.Using

/** K2 — transactional JDBC sink (reference:
  * /root/reference/src/internal/warehouses/sqlserver/sqlserver.go:92-200).
  *
  * The reference streams every row of a batch through one prepared
  * INSERT inside ONE transaction and rolls the whole batch back on any
  * row error — all-or-nothing append into EXECUTE_DOCUMENTS
  * (tx at sqlserver.go:103, per-row Exec 171-187, rollback 188-190,
  * commit 194). Spark's stock `df.write.jdbc` commits per partition —
  * a mid-batch failure leaves partial state visible — so the same
  * atomicity is re-expressed as a staging-table swap:
  *
  *  1. the batch lands in a staging table via the normal distributed
  *     `df.write.jdbc` (parallel per-partition inserts — the part that
  *     must scale; a failure here leaves only invisible staging rows);
  *  2. ONE driver-side transaction moves staging → target with a single
  *     `INSERT INTO target SELECT … FROM staging`; any error — constraint
  *     violation, type overflow — rolls back, leaving the target
  *     byte-identical to before the batch (the tx.Rollback() contract);
  *  3. the staging table is dropped either way.
  *
  * Dialect surface is ANSI (quoted identifiers, INSERT…SELECT), so any
  * JDBC warehouse works; the spec exercises embedded Derby from
  * /opt/spark/jars. Single-loader-per-target assumption, same as the
  * reference's one sync process.
  */
object JdbcSink {

  /** Append `df` to `table` all-or-nothing. Creates the target with the
    * frame's schema if it does not exist. Returns the number of rows
    * appended (0 on an empty batch — the reference also skips empty
    * batches). Throws after rollback if the final move fails; the
    * target is untouched in that case. */
  def appendTransactional(df: DataFrame, url: String, table: String,
      props: Properties = new Properties): Long = {
    val staging = table + "_STG"
    val cols = df.columns.map(quote).mkString(", ")

    // 1. distributed land into staging (overwrite: drops any leftover
    //    staging table from a previous failed run — idempotent restart)
    df.write.mode("overwrite").jdbc(url, staging, props)

    // 2-3. single-transaction move + drop, on one driver connection
    Using.resource(connect(url, props)) { conn =>
      try {
        if (!tableExists(conn, table))
          // empty clone of staging ⇒ identical column types without a
          // dialect-specific DDL generator
          execute(conn,
            s"CREATE TABLE ${quote(table)} AS SELECT * FROM ${quote(staging)} WITH NO DATA")
        conn.setAutoCommit(false)
        val n = count(conn, staging)
        try {
          execute(conn,
            s"INSERT INTO ${quote(table)} ($cols) SELECT $cols FROM ${quote(staging)}")
          conn.commit()
        } catch {
          case e: Throwable =>
            try conn.rollback() catch { case _: Throwable => () }
            throw e
        }
        n
      } finally {
        try { conn.setAutoCommit(true); execute(conn, s"DROP TABLE ${quote(staging)}") }
        catch { case _: Throwable => () }
      }
    }
  }

  private def connect(url: String, props: Properties): Connection = {
    Option(props.getProperty("driver"))
      .foreach(c => Class.forName(c)) // mirror Spark's driver preload
    DriverManager.getConnection(url, props)
  }

  // Spark's JDBC writer quotes identifiers, creating case-exact names;
  // quote the same way so `type`/`date` (reserved words) round-trip
  private def quote(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  // getTables takes a LIKE pattern: a literal `_` (EXECUTE_DOCUMENTS!)
  // would match any character — escape metacharacters for an exact match
  private def tableExists(conn: Connection, table: String): Boolean = {
    val esc = conn.getMetaData.getSearchStringEscape
    val pat = table.replace(esc, esc + esc)
      .replace("_", esc + "_").replace("%", esc + "%")
    Using.resource(conn.getMetaData.getTables(null, null, pat, null))(_.next())
  }

  private def count(conn: Connection, table: String): Long =
    Using.resource(conn.createStatement()) { st =>
      Using.resource(st.executeQuery(s"SELECT COUNT(*) FROM ${quote(table)}")) { rs =>
        rs.next(); rs.getLong(1)
      }
    }

  private def execute(conn: Connection, sql: String): Unit =
    Using.resource(conn.createStatement())(_.execute(sql))
}
