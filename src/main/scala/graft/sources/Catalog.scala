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
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    deleteRecursive(spark, s"$wh/$table")
    write
  }

  /** Recursive delete through the path's own Hadoop filesystem — works
    * for local, hdfs://, and object-store paths alike (shared by table
    * recreation and sidecar-version retention). */
  def deleteRecursive(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true): Unit
  }
}
