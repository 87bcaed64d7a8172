package graft.datalog

/** Datalog query AST — the Spark-native re-expression of unifyDB's query
  * language (reference: /root/reference/src/unifydb/query.clj:286-299
  * `qeval` dispatch — :and, :or, :not, predicates, binding functions,
  * simple patterns — and :find/:sort-by/:limit/:bind processing in
  * `do-query`, query.clj:488-503).
  *
  * Where the reference streams frames (variable-binding maps) through a
  * unification interpreter one fact at a time, we compile the whole
  * query to a single Catalyst logical plan: a frame-set is a DataFrame
  * whose columns are the bound variables. Unification of a pattern
  * against the fact log becomes filter + project; conjunction becomes
  * equi-join on the shared variable columns; disjunction becomes union;
  * negation becomes anti-join. Catalyst then owns join order, pushdown
  * and codegen — nothing is interpreted per-row on the driver.
  */
sealed trait Term
final case class V(name: String) extends Term            // ?var
final case class C(value: Any) extends Term              // constant
case object W extends Term                               // _ wildcard

sealed trait Clause
/** [e a v tx added] 5-tuple pattern (reference pads clauses to 5,
  * query.clj:301-304). */
final case class Pattern(e: Term, a: Term, v: Term,
                         tx: Term = W, added: Term = W) extends Clause
final case class And(clauses: Clause*) extends Clause
final case class Or(clauses: Clause*) extends Clause
final case class Not(clause: Clause) extends Clause
/** [(op args...)] filter predicate, e.g. Pred("<", V("s"), C(100)). */
final case class Pred(op: String, args: Term*) extends Clause
/** [(fn args...) ?out] binding function (query.clj:106-130). */
final case class FnBind(fn: String, out: V, args: Term*) extends Clause
/** Application of a named rule. */
final case class RuleApp(name: String, args: Term*) extends Clause

/** A named deductive rule: head params + body (reference rules,
  * query.clj:260-274; recursion supported via semi-naive fixpoint). */
final case class Rule(name: String, params: Seq[V], body: Clause)

sealed trait FindExpr { def alias: String }
/** Plain variable in :find — also the implicit grouping key. */
final case class FVar(v: V, alias: String) extends FindExpr
object FVar { def apply(n: String): FVar = FVar(V(n), n) }
/** Aggregate in :find (reference `aggregate`, query.clj:353-378):
  * sum min max mean avg median mode stddev count count-distinct distinct. */
final case class FAgg(fn: String, v: V, alias: String) extends FindExpr

final case class SortKey(alias: String, desc: Boolean = false)

final case class Query(
    find: Seq[FindExpr],
    where: Clause,
    rules: Seq[Rule] = Nil,
    sortBy: Seq[SortKey] = Nil,
    limit: Option[Int] = None,
    bind: Map[String, Any] = Map.empty)
