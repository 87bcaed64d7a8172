package graft

/** Cluster-deploy entry point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` registers graft's native
  * SQL functions in EVERY session the cluster builds (including Thrift
  * Server / Connect sessions no user code touches). Alias of
  * [[graft.functions.GraftExtensions]] at the library root — one
  * implementation, one set of arity-checked builders
  * ([[graft.functions.VectorExpressions.sqlFunctions]]).
  */
class GraftExtensions extends graft.functions.GraftExtensions
