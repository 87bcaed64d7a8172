package graft.datalog

/** EDN front-end for the Datalog engine — the TEXTUAL face of the
  * reference's query language, so a unifyDB user's query maps run
  * against graft verbatim (reference surface: query maps
  * `{:find .. :where .. :rules .. :sort-by .. :limit .. :bind ..}`,
  * src/unifydb/query.clj:488-503 `do-query` destructuring; clause
  * forms per qeval dispatch query.clj:286-299; rule definitions
  * test/unifydb/query_test.clj:135-140).
  *
  * The parser covers the EDN subset those maps use: nil/booleans,
  * longs, doubles, strings, keywords, symbols, lists, vectors, maps,
  * `;` comments, commas-as-whitespace. The reader translates the
  * parsed form to [[Query]]/[[Clause]] ASTs — everything downstream
  * (compilation to one Catalyst plan, rules, fixpoints, aggregates,
  * sort/limit/bind) is the existing engine; this file is syntax only.
  *
  * Pull expressions in :find (`(pull ?e [:attr {:ref [...]}])`,
  * reference src/unifydb/query/pull.clj:7-21, exercised at
  * test/unifydb/query_test.clj:521-570) parse onto [[FPull]]/
  * [[Pull.Spec]] — nested map refs included — and compile through the
  * same one-subquery-per-pull path as the typed dl_pull face.
  *
  * Rest-patterns in value position (`[?h & ?t]`, reference
  * unify.clj:85, query_test.clj:30-60) parse onto [[RestPattern]] when
  * the caller supplies the attribute's component-field encoding via
  * `componentFields` (graft's typed-column value model stores a
  * queryable collection as a sub-entity — the fields are the schema
  * knowledge the engine keeps outside the query text). The single var
  * after `&` binds the REMAINING components as one struct column
  * (graft's flat re-encoding of the reference's nested-list rest
  * value); `_` after `&` ignores them.
  *
  * Find-position `sum`/`avg`/`stddev` route through the engine's
  * exact-decimal aggregation path (Compiler `sum$exact` etc.): a
  * text-form double sum would otherwise be accumulation-order
  * dependent — not reproducible across cluster sizes, and never
  * hash-equal to an exact oracle.
  *
  * An empty-body rule is supported exactly in the reference's
  * `(:same ?x ?x)` shape (duplicate head params become explicit
  * equality predicates).
  */
sealed trait Edn
object Edn {
  case object ENil extends Edn
  final case class EBool(v: Boolean) extends Edn
  final case class ELong(v: Long) extends Edn
  final case class EDouble(v: Double) extends Edn
  final case class EStr(v: String) extends Edn
  /** ":ns/name" stored as "ns/name". */
  final case class EKw(name: String) extends Edn
  final case class ESym(name: String) extends Edn
  final case class ELst(items: Vector[Edn]) extends Edn
  final case class EVec(items: Vector[Edn]) extends Edn
  final case class EMap(entries: Vector[(Edn, Edn)]) extends Edn
  /** Set literal `#{...}` (the reference's membership-predicate syntax,
    * `[(some #{:computer} ?job)]`, query_test.clj operators test). */
  final case class ESet(items: Vector[Edn]) extends Edn
  /** Tagged literal `#tag form` (the reference prints entity ids as
    * `#unifydb/id N`). */
  final case class ETagged(tag: String, value: Edn) extends Edn

  /** Canonical EDN text of a form — the rendering graft stores when a
    * reference VALUE-semantic collection (a non-map vector value in tx
    * data, e.g. `:job [:computer :wizard]`) becomes ONE string value
    * (the documented collections mapping, SURVEY §4 /
    * ReferenceCorpusSpec): value identity, grouping and counting then
    * behave exactly as the reference's collection-value identity. */
  def render(e: Edn): String = e match {
    case ENil => "nil"
    case EBool(v) => v.toString
    case ELong(v) => v.toString
    case EDouble(v) => v.toString
    case EStr(v) => "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case EKw(n) => ":" + n
    case ESym(n) => n
    case ELst(items) => items.map(render).mkString("(", " ", ")")
    case EVec(items) => items.map(render).mkString("[", " ", "]")
    case EMap(entries) =>
      entries.map { case (k, v) => render(k) + " " + render(v) }
        .mkString("{", ", ", "}")
    case ESet(items) => items.map(render).mkString("#{", " ", "}")
    case ETagged(tag, value) => s"#$tag ${render(value)}"
  }

  /** Parse ONE edn form (trailing whitespace/comments allowed). */
  def parse(s: String): Edn = {
    val p = new Parser(s)
    val v = p.form()
    p.skipWs()
    require(p.eof, s"trailing content at offset ${p.pos}: '${p.rest.take(20)}'")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def rest: String = s.substring(pos)
    private def peek: Char = s.charAt(pos)

    def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        val c = peek
        if (c == ';') { while (!eof && peek != '\n') pos += 1 }
        else if (c.isWhitespace || c == ',') pos += 1
        else go = false
      }
    }

    def form(): Edn = {
      skipWs()
      require(!eof, "unexpected end of input")
      peek match {
        case '(' => pos += 1; ELst(seqUntil(')'))
        case '[' => pos += 1; EVec(seqUntil(']'))
        case '{' =>
          pos += 1
          val items = seqUntil('}')
          require(items.length % 2 == 0, "map literal needs even number of forms")
          EMap(items.grouped(2).map(p => (p(0), p(1))).toVector)
        case '"' => str()
        case '#' =>
          pos += 1
          if (!eof && peek == '{') { pos += 1; ESet(seqUntil('}')) }
          else {
            val tagStart = pos
            while (!eof && !peek.isWhitespace && peek != ',' && !delim(peek)) pos += 1
            val tag = s.substring(tagStart, pos)
            require(tag.nonEmpty, s"empty tag at $tagStart")
            ETagged(tag, form())
          }
        case _ => atom()
      }
    }

    private def seqUntil(close: Char): Vector[Edn] = {
      val b = Vector.newBuilder[Edn]
      skipWs()
      while ({ require(!eof, s"unclosed '$close'"); peek != close }) {
        b += form(); skipWs()
      }
      pos += 1
      b.result()
    }

    private def str(): Edn = {
      pos += 1 // opening quote
      val b = new StringBuilder
      while ({ require(!eof, "unclosed string"); peek != '"' }) {
        val c = peek
        if (c == '\\') {
          pos += 1
          require(!eof, "dangling escape")
          b += (peek match {
            case 'n' => '\n'
            case 't' => '\t'
            case 'r' => '\r'
            case '"' => '"'
            case '\\' => '\\'
            case other => other
          })
        } else b += c
        pos += 1
      }
      pos += 1 // closing quote
      EStr(b.toString)
    }

    private val delim = Set('(', ')', '[', ']', '{', '}', '"', ';')
    private def atom(): Edn = {
      val start = pos
      while (!eof && !peek.isWhitespace && peek != ',' && !delim(peek)) pos += 1
      val t = s.substring(start, pos)
      require(t.nonEmpty, s"empty token at $start")
      t match {
        case "nil" => ENil
        case "true" => EBool(true)
        case "false" => EBool(false)
        case _ if t.head == ':' => EKw(t.tail)
        case _ if t.matches("[+-]?\\d+") => ELong(t.toLong)
        case _ if t.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?") ||
          t.matches("[+-]?\\d+[eE][+-]?\\d+") => EDouble(t.toDouble)
        case _ => ESym(t)
      }
    }
  }
}

/** EDN query map → [[Query]] AST. */
object QueryText {
  import Edn._

  /** `componentFields` maps a collection-valued attribute to its
    * ordered sub-entity component fields (the typed-column encoding of
    * the reference's in-fact collection values) — required only for
    * queries that use a rest-pattern `[?h & ?t]` in value position. */
  def parseQuery(text: String,
                 componentFields: Map[String, Seq[String]] = Map.empty): Query =
    readQuery(Edn.parse(text), componentFields)

  /** `{:tx-id :latest | #unifydb/id N [, :historical true]}` →
    * [[Compiler.Db]] over `facts` — the reference's db-map wire shape
    * (util/query's first argument; every `:db` entry in
    * query_test.clj), so BOTH maps of a reference test case run from
    * verbatim text. */
  def parseDb(text: String, facts: graft.core.FactDb): Compiler.Db =
    readDb(Edn.parse(text), facts)

  def readDb(e: Edn, facts: graft.core.FactDb): Compiler.Db = e match {
    case EMap(entries) =>
      val m = entries.collect { case (EKw(k), v) => k -> v }.toMap
      val asOf = m.get("tx-id") match {
        case Some(EKw("latest")) | None => Long.MaxValue
        case Some(ETagged("unifydb/id", ELong(n))) => n
        case Some(ELong(n)) => n
        case Some(other) => sys.error(s"unsupported :tx-id: $other")
      }
      val hist = m.get("historical") match {
        case Some(EBool(b)) => b
        case None => false
        case Some(other) => sys.error(s":historical must be a boolean, got $other")
      }
      Compiler.Db(facts, asOf = asOf, historical = hist)
    case other => sys.error(s"db spec must be an EDN map, got $other")
  }

  def readQuery(e: Edn,
                componentFields: Map[String, Seq[String]] = Map.empty): Query = e match {
    case EMap(entries) =>
      val m = entries.collect { case (EKw(k), v) => k -> v }.toMap
      val find = m.getOrElse("find",
        sys.error("query map needs :find")) match {
        case EVec(items) => items.map(findExpr)
        case other => sys.error(s":find must be a vector, got $other")
      }
      val where = m.getOrElse("where",
        sys.error("query map needs :where")) match {
        case EVec(items) => And(items.map(clause(_, componentFields)): _*)
        case other => sys.error(s":where must be a vector, got $other")
      }
      val rules = m.get("rules") match {
        case Some(EVec(defs)) => defs.map(ruleDef(_, componentFields))
        case None => Vector.empty
        case other => sys.error(s":rules must be a vector, got $other")
      }
      val (sortKeys, _) = m.get("sort-by") match {
        case Some(sb) => sortBy(sb, find)
        case None => (Vector.empty[SortKey], false)
      }
      val limit = m.get("limit") match {
        case Some(ELong(n)) => Some(n.toInt)
        case None => None
        case other => sys.error(s":limit must be an integer, got $other")
      }
      val bind = m.get("bind") match {
        case Some(EMap(bs)) => bs.map {
          case (ESym(k), v) => varName(k) -> constVal(v)
          case (k, _) => sys.error(s":bind key must be a symbol, got $k")
        }.toMap
        case None => Map.empty[String, Any]
        case other => sys.error(s":bind must be a map, got $other")
      }
      Query(find, where, rules, sortKeys, limit, bind)
    case other => sys.error(s"query must be an EDN map, got $other")
  }

  /** Reference queries accept vars with or without the ? sigil
    * (query.clj expand-question-marks). */
  private def varName(s: String): String = s.stripPrefix("?")

  private def constVal(e: Edn): Any = e match {
    case EStr(s) => s
    case EKw(k) => k
    case ELong(n) => if (n.isValidInt) n.toInt else n
    case EDouble(d) => d
    case EBool(b) => b
    case ENil => null
    // `#unifydb/id N` tagged entity-id literal (the reference prints and
    // accepts these anywhere a value can appear, e.g. `:bind {?who
    // #unifydb/id 1}`) — entity ids are Longs in graft's fact log.
    case ETagged("unifydb/id", ELong(n)) => n
    case other => sys.error(s"unsupported :bind value: $other")
  }

  private def term(e: Edn): Term = e match {
    case ESym("_") => W
    case ESym(s) => V(varName(s))
    case EKw(k) => C(k) // attribute / enum keyword → string constant
    case EStr(s) => C(s)
    case ELong(n) => if (n.isValidInt) C(n.toInt) else C(n)
    case EDouble(d) => C(d)
    case EBool(b) => C(b)
    case ENil => C(null)
    // `#unifydb/id N` in a :where pattern or rule application — the
    // reference fixture shape `(:lives-near ?who #unifydb/id 1)`
    // (query_test.clj:134). Long, matching the fact log's e column.
    case ETagged("unifydb/id", ELong(n)) => C(n)
    case other => sys.error(s"unsupported term: $other")
  }

  private def opName(e: Edn): String = e match {
    case ESym(s) => s
    case EKw(k) => k
    case other => sys.error(s"operator must be a symbol/keyword, got $other")
  }

  def clause(e: Edn): Clause = clause(e, Map.empty)

  def clause(e: Edn, cf: Map[String, Seq[String]]): Clause = e match {
    // [:and ...] / [:or ...] / [:not c]
    case EVec(EKw("and") +: rest) => And(rest.map(clause(_, cf)): _*)
    case EVec(EKw("or") +: rest) => Or(rest.map(clause(_, cf)): _*)
    case EVec(EKw("not") +: rest) =>
      require(rest.length == 1, ":not takes exactly one clause")
      Not(clause(rest.head, cf))
    // [(fn args...) ?out] binding function
    case EVec(Vector(ELst(op +: args), out @ ESym(_))) =>
      FnBind(opName(op), term(out).asInstanceOf[V], args.map(term): _*)
    // [(some #{..} ?v)] / [(in ?v #{..})] — set-literal membership
    // (reference operators test, query_test.clj: `(some #{:computer}
    // ?job)`); the scalar var tests membership in the constant set.
    // Lowered to Pred("in", scalar, elem*) — in graft's value model
    // the var binds a SCALAR (e.g. one cardinality-many tag), the
    // documented re-encoding of in-fact collection values.
    case EVec(Vector(ELst(op +: args)))
        if Set("some", "in")(opName(op)) && args.exists(_.isInstanceOf[ESet]) =>
      val set = args.collectFirst { case s: ESet => s }.get
      val scalars = args.filterNot(_.isInstanceOf[ESet])
      require(scalars.length == 1,
        s"membership predicate needs exactly one non-set argument: $e")
      Pred("in", (term(scalars.head) +: set.items.map(term)): _*)
    // [(op args...)] predicate
    case EVec(Vector(ELst(op +: args))) =>
      Pred(opName(op), args.map(term): _*)
    // (rule-name args...) rule application (reference rule names are
    // keywords, e.g. (:lives-near ?a ?b))
    case ELst(head +: args) => RuleApp(opName(head), args.map(term): _*)
    // [?e :attr [... & ...]] — rest-pattern in value position
    // (reference unify.clj:85; query_test.clj:41-57). Needs the
    // attribute's component-field encoding (see parseQuery doc).
    case EVec(Vector(ePos, EKw(attr), v: EVec))
        if v.items.exists(_ == ESym("&")) || cf.contains(attr) =>
      restClause(term(ePos), attr, v, cf)
    // plain pattern [e] / [e a] / [e a v] / [e a v tx] / [e a v tx added]
    // — the reference pads short clauses to the 5-tuple with wildcards
    // (query.clj pad-clause), so `[?e :name]` is a valid clause.
    case EVec(items) if items.nonEmpty && items.length <= 5 =>
      val ts = items.map(term).padTo(5, W: Term)
      Pattern(ts(0), ts(1), ts(2), ts(3), ts(4))
    case other => sys.error(s"unsupported clause: $other")
  }

  /** Lower a value-position vector pattern — positional
    * (`[:computer ?what]`) or rest (`[?town & ?rest]`) — onto
    * [[RestPattern]] over the attribute's component-field encoding.
    * The single var after `&` binds the remaining components as one
    * struct column (graft's flat re-encoding of the reference's
    * nested-list rest value); `_` after `&` ignores them. */
  private def restClause(ePos: Term, attr: String, v: EVec,
                         cf: Map[String, Seq[String]]): Clause = {
    val fields = cf.getOrElse(attr, sys.error(
      s"rest/positional pattern on :$attr needs componentFields for it " +
        "(the sub-entity encoding's ordered component fields)"))
    val ampIdx = v.items.indexOf(ESym("&"))
    if (ampIdx < 0) {
      // positional: every component named, same shape as the list
      require(v.items.length == fields.length,
        s"positional pattern on :$attr has ${v.items.length} terms, " +
          s"encoding has ${fields.length} components (use & for a prefix)")
      val ts = v.items.map(term)
      RestPattern(ePos, C(attr), fields, ts.head, ts.tail)
    } else {
      require(ampIdx >= 1 && ampIdx == v.items.length - 2,
        s"rest-pattern must be [p0 ... & rest], got $v")
      require(ampIdx < fields.length,
        s"rest-pattern on :$attr names $ampIdx positions before &, " +
          s"encoding has only ${fields.length} components")
      val before = v.items.take(ampIdx).map(term)
      val restForm = v.items.last
      val nRest = fields.length - ampIdx
      restForm match {
        case ESym("_") =>
          RestPattern(ePos, C(attr), fields, before.head,
            before.tail ++ Vector.fill(nRest)(W: Term))
        case ESym(s) =>
          // bind remaining components to internal vars, then assemble
          // the user's rest var as ONE struct column (compiler drops
          // the internals at projection)
          val rv = varName(s)
          val innerVs = (0 until nRest).map(i => V(s"__${rv}$$rest$i"))
          And(
            RestPattern(ePos, C(attr), fields, before.head,
              before.tail ++ innerVs),
            FnBind("struct", V(rv), innerVs: _*))
        case other => sys.error(s"after & expects a var or _, got $other")
      }
    }
  }

  private def findExpr(e: Edn): FindExpr = e match {
    case ESym(s) => val n = varName(s); FVar(V(n), n)
    // (pull ?e [:attr ... {:ref [...]}]) — nested map refs recurse.
    // Flat columns when every pulled attr name is unique across
    // levels (oracle-friendly); the reference's nested-map shape (one
    // struct column) when flat names would collide.
    case ELst(Vector(ESym("pull"), ESym(v), spec: EVec)) =>
      val n = varName(v)
      val sp = pullSpec(spec)
      def scalarAttrs(s: Pull.Spec): Seq[String] =
        s.attrs ++ s.refs.flatMap { case (_, sub) => scalarAttrs(sub) }
      val flatNames = scalarAttrs(sp)
      FPull(V(n), sp, n, nested = flatNames.distinct.size != flatNames.size)
    case ELst(Vector(op, ESym(v))) =>
      val fn0 = opName(op)
      val n = varName(v)
      // Text-face sums/avgs/stddevs route through the exact-decimal
      // aggregation path: a distributed double sum is accumulation-
      // order dependent, so the plain text form would not be
      // reproducible across cluster sizes (or hash-equal to an exact
      // oracle). The alias keeps the user-facing fn name.
      val fn = fn0 match {
        case "sum" => "sum$exact"
        case "avg" | "mean" => "avg$exact"
        case "stddev" => "stddev$exact"
        case other => other
      }
      FAgg(fn, V(n), s"${fn0.replace('-', '_')}_$n")
    case other => sys.error(s"unsupported :find expression: $other")
  }

  /** `[:attr1 :attr2 {:ref [...]} ...]` → [[Pull.Spec]] (reference
    * pull pattern grammar, pull.clj:7-21). */
  private def pullSpec(e: EVec): Pull.Spec = {
    val attrs = Vector.newBuilder[String]
    val refs = Vector.newBuilder[(String, Pull.Spec)]
    e.items.foreach {
      case EKw(k) => attrs += k
      case EMap(entries) => entries.foreach {
        case (EKw(r), sub: EVec) => refs += (r -> pullSpec(sub))
        case (k, v) => sys.error(s"pull ref entry must be {:ref [spec]}, got $k $v")
      }
      case other => sys.error(s"unsupported pull spec entry: $other")
    }
    Pull.Spec(attrs.result(), refs.result())
  }

  /** Rule def: [(name ?p...) body-clause...]. Duplicate head params
    * (the reference's `(:same ?x ?x)`) are renamed apart and become
    * explicit equality predicates in the body. */
  private def ruleDef(e: Edn, cf: Map[String, Seq[String]] = Map.empty): Rule = e match {
    case EVec(ELst(name +: params) +: body) =>
      val ps = params.map {
        case ESym(s) => V(varName(s))
        case other => sys.error(s"rule param must be a symbol, got $other")
      }
      val seen = scala.collection.mutable.Map.empty[String, Int]
      val renamed = ps.map { p =>
        val k = seen.getOrElse(p.name, 0)
        seen(p.name) = k + 1
        if (k == 0) p else V(s"${p.name}__dup$k")
      }
      val eqPreds = ps.zip(renamed).collect {
        case (orig, ren) if orig != ren => Pred("=", orig, ren)
      }
      val bodyClauses = body.map(clause(_, cf)) ++ eqPreds
      require(bodyClauses.nonEmpty,
        s"empty rule body with no duplicate params: $e")
      Rule(opName(name), renamed, And(bodyClauses: _*))
    case other => sys.error(s"unsupported rule definition: $other")
  }

  /** Reference tx-data text → [[graft.transact.Transactor.TxStmt]]s —
    * the transact half of the textual face (reference forms:
    * `[:unifydb/add e :attr v]` / `[:unifydb/retract e :attr v]` /
    * nested map forms with `:unifydb/id`, transact.clj:23-49
    * map-form->add-forms + process-tx-data; `#unifydb/id N` tagged
    * ids). A string in entity OR value position that is used as a
    * temp id anywhere in the same tx-data resolves as that temp id
    * (the reference's gen-temp-ids rule); other strings stay string
    * values. */
  def parseTxData(text: String,
                  sess: graft.transact.Transactor.Session)
      : Seq[graft.transact.Transactor.TxStmt] = {
    import graft.transact.Transactor
    val stmts = Edn.parse(text) match {
      case EVec(items) => items
      case other => sys.error(s"tx-data must be a vector, got $other")
    }
    // pass 1: every string used as an entity id (Add/Retract e, or a
    // map form's :unifydb/id) is a temp id
    def mapTempIds(m: EMap): Vector[String] =
      m.entries.flatMap {
        case (EKw("unifydb/id"), EStr(s)) => Vector(s)
        case (_, v: EMap) => mapTempIds(v)
        case (_, EVec(items)) => items.collect { case mm: EMap => mapTempIds(mm) }.flatten
        case _ => Vector.empty
      }
    val tempIds: Set[String] = stmts.flatMap {
      case EVec(Vector(EKw("unifydb/add" | "unifydb/retract"), EStr(s), _, _)) => Vector(s)
      case m: EMap => mapTempIds(m)
      case _ => Vector.empty
    }.toSet
    def entity(e: Edn): Any = e match {
      case EStr(s) => s // temp id (entity position is always an id)
      case ELong(n) => n
      case ETagged("unifydb/id", ELong(n)) => n
      case other => sys.error(s"unsupported entity form: $other")
    }
    def value(v: Edn): Any = v match {
      case EStr(s) if tempIds(s) => sess.EntityRef(s)
      case ETagged("unifydb/id", ELong(n)) => sess.EntityRef(n)
      case m: EMap => mapForm(m)
      // seq-of-maps fans out to per-child refs (expand-map-forms);
      // a NON-map vector is a reference VALUE-semantic collection
      // (transact_test.clj "Non-map lists": `:bar [1 2 3]` stays ONE
      // value) — stored as its canonical EDN rendering, the documented
      // collections mapping
      case EVec(items) if items.nonEmpty && items.forall(_.isInstanceOf[EMap]) =>
        items.map(value)
      case v: EVec => Edn.render(v)
      case other => constVal(other)
    }
    def mapForm(m: EMap): Transactor.MapForm = {
      val tempId = m.entries.collectFirst {
        case (EKw("unifydb/id"), EStr(s)) => s }
      val attrs = m.entries.collect {
        case (EKw(k), v) if k != "unifydb/id" => k -> value(v)
        case (ESym(k), v) => k -> value(v)
      }
      Transactor.MapForm(attrs, tempId)
    }
    stmts.map {
      case EVec(Vector(EKw("unifydb/add"), e, EKw(a), v)) =>
        Transactor.Add(entity(e), a, value(v))
      case EVec(Vector(EKw("unifydb/retract"), e, EKw(a), v)) =>
        Transactor.Retract(entity(e), a, value(v))
      case m: EMap => mapForm(m)
      case other => sys.error(s"unsupported tx statement: $other")
    }
  }

  /** :sort-by — a single expr or a vector, optional trailing
    * :asc/:desc applying to the WHOLE sort (reference
    * process-sort-by). Exprs must match a :find entry. */
  private def sortBy(e: Edn, find: Seq[FindExpr]): (Vector[SortKey], Boolean) = {
    val items = e match {
      case EVec(is) => is
      case single => Vector(single)
    }
    val (desc, keys) = items.lastOption match {
      case Some(EKw("desc")) => (true, items.init)
      case Some(EKw("asc")) => (false, items.init)
      case _ => (false, items)
    }
    val sortKeys = keys.map { k =>
      val alias = k match {
        case ESym(s) =>
          val n = varName(s)
          // Not in :find is VALID reference syntax (query_test.clj:
          // 384-400): the var joins the set-semantics key and the
          // compiler drops it after the sort.
          find.collectFirst { case FVar(V(`n`), a) => a }.getOrElse(n)
        case ELst(Vector(op, ESym(v))) =>
          val fn0 = opName(op)
          // same exact-decimal aliasing as findExpr, so
          // `:sort-by (sum ?x)` matches the `sum$exact` find entry
          val fn = fn0 match {
            case "sum" => "sum$exact"
            case "avg" | "mean" => "avg$exact"
            case "stddev" => "stddev$exact"
            case other => other
          }
          val n = varName(v)
          find.collectFirst { case FAgg(`fn`, V(`n`), a) => a }
            .getOrElse(sys.error(s"sort-by aggregate ($fn0 ?$n) not in :find"))
        case other => sys.error(s"unsupported sort-by expression: $other")
      }
      SortKey(alias, desc)
    }
    (sortKeys, desc)
  }
}
