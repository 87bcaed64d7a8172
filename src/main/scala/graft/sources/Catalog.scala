package graft.sources

import org.apache.spark.sql.SparkSession

/** Managed-table lifecycle helper for the session-written bucketed
  * layouts (fact logs, signature sidecars, ANN indexes).
  */
object Catalog {

  /** Drop `table` AND its leftover warehouse directory before running
    * `write`: a previous JVM's data files outlive that JVM's
    * session-scoped catalog entry, and saveAsTable refuses to create a
    * managed table over an existing location. */
  def recreate(spark: SparkSession, table: String)(write: => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit =
      if (f.exists()) {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
    rm(new java.io.File(s"$wh/$table"))
    write
  }
}
