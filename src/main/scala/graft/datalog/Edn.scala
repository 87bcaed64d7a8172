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
  * Deliberate v1 limits (documented, fail fast): pull expressions in
  * :find and rest-patterns in values are AST-level features with their
  * own typed constructors (the text forms need schema knowledge the
  * engine keeps elsewhere); an empty-body rule is supported exactly in
  * the reference's `(:same ?x ?x)` shape (duplicate head params become
  * explicit equality predicates).
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
  /** Tagged literal `#tag form` (the reference prints entity ids as
    * `#unifydb/id N`). */
  final case class ETagged(tag: String, value: Edn) extends Edn

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
          val tagStart = pos
          while (!eof && !peek.isWhitespace && peek != ',' && !delim(peek)) pos += 1
          val tag = s.substring(tagStart, pos)
          require(tag.nonEmpty, s"empty tag at $tagStart")
          ETagged(tag, form())
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

  def parseQuery(text: String): Query = readQuery(Edn.parse(text))

  def readQuery(e: Edn): Query = e match {
    case EMap(entries) =>
      val m = entries.collect { case (EKw(k), v) => k -> v }.toMap
      val find = m.getOrElse("find",
        sys.error("query map needs :find")) match {
        case EVec(items) => items.map(findExpr)
        case other => sys.error(s":find must be a vector, got $other")
      }
      val where = m.getOrElse("where",
        sys.error("query map needs :where")) match {
        case EVec(items) => And(items.map(clause): _*)
        case other => sys.error(s":where must be a vector, got $other")
      }
      val rules = m.get("rules") match {
        case Some(EVec(defs)) => defs.map(ruleDef)
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
    case other => sys.error(s"unsupported term: $other")
  }

  private def opName(e: Edn): String = e match {
    case ESym(s) => s
    case EKw(k) => k
    case other => sys.error(s"operator must be a symbol/keyword, got $other")
  }

  def clause(e: Edn): Clause = e match {
    // [:and ...] / [:or ...] / [:not c]
    case EVec(EKw("and") +: rest) => And(rest.map(clause): _*)
    case EVec(EKw("or") +: rest) => Or(rest.map(clause): _*)
    case EVec(EKw("not") +: rest) =>
      require(rest.length == 1, ":not takes exactly one clause")
      Not(clause(rest.head))
    // [(fn args...) ?out] binding function
    case EVec(Vector(ELst(op +: args), out @ ESym(_))) =>
      FnBind(opName(op), term(out).asInstanceOf[V], args.map(term): _*)
    // [(op args...)] predicate
    case EVec(Vector(ELst(op +: args))) =>
      Pred(opName(op), args.map(term): _*)
    // (rule-name args...) rule application (reference rule names are
    // keywords, e.g. (:lives-near ?a ?b))
    case ELst(head +: args) => RuleApp(opName(head), args.map(term): _*)
    // plain pattern [e a v] / [e a v tx] / [e a v tx added]
    case EVec(items) if items.length >= 3 && items.length <= 5 =>
      val ts = items.map(term)
      Pattern(ts(0), ts(1), ts(2),
        if (ts.length > 3) ts(3) else W,
        if (ts.length > 4) ts(4) else W)
    case other => sys.error(s"unsupported clause: $other")
  }

  private def findExpr(e: Edn): FindExpr = e match {
    case ESym(s) => val n = varName(s); FVar(V(n), n)
    case ELst(Vector(op, ESym(v))) =>
      val fn = opName(op)
      val n = varName(v)
      FAgg(fn, V(n), s"${fn.replace('-', '_')}_$n")
    case other => sys.error(
      s"unsupported :find expression (pull goes through the typed API): $other")
  }

  /** Rule def: [(name ?p...) body-clause...]. Duplicate head params
    * (the reference's `(:same ?x ?x)`) are renamed apart and become
    * explicit equality predicates in the body. */
  private def ruleDef(e: Edn): Rule = e match {
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
      val bodyClauses = body.map(clause) ++ eqPreds
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
      case EVec(items) => items.map(value)
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
          find.collectFirst { case FVar(V(`n`), a) => a }
            .getOrElse(sys.error(s"sort-by var ?$n not in :find"))
        case ELst(Vector(op, ESym(v))) =>
          val fn = opName(op)
          val n = varName(v)
          find.collectFirst { case FAgg(`fn`, V(`n`), a) => a }
            .getOrElse(sys.error(s"sort-by aggregate ($fn ?$n) not in :find"))
        case other => sys.error(s"unsupported sort-by expression: $other")
      }
      SortKey(alias, desc)
    }
    (sortKeys, desc)
  }
}
