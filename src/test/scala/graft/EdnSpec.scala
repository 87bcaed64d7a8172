package graft

import graft.core.{FactDb, FactStore}
import graft.datalog._
import graft.datalog.Compiler.Db
import graft.datalog.Edn._
import org.apache.spark.sql.Row

/** EDN front-end: the reference's TEXTUAL query maps parse and run
  * against the engine verbatim (reference query shapes:
  * test/unifydb/query_test.clj — rules :135-140, sort/limit :371-397,
  * bind :272). */
class EdnSpec extends SparkSpec {

  private def mkDb(facts: Seq[Row], types: Map[String, String]): Db =
    Db(FactDb(
      spark.createDataFrame(spark.sparkContext.parallelize(facts, 1), FactStore.factSchema),
      types))

  private def s(e: Long, a: String, v: String): Row =
    Row(e, a, "s", v, null, null, null, null, 0L, true)
  private def l(e: Long, a: String, v: Long): Row =
    Row(e, a, "l", null, v, null, null, null, 0L, true)

  private val employees = mkDb(Seq(
    s(1, "name", "Ben Bitdiddle"), s(1, "town", "slumerville"), l(1, "salary", 60000),
    s(2, "name", "Alyssa P. Hacker"), s(2, "town", "cambridge"), l(2, "salary", 40000),
    s(3, "name", "Lem E. Tweakit"), s(3, "town", "slumerville"), l(3, "salary", 25000)),
    Map("name" -> "vstr", "town" -> "vstr", "salary" -> "vlong"))

  test("edn parser: atoms, collections, comments, commas") {
    assert(Edn.parse("nil") === ENil)
    assert(Edn.parse("42") === ELong(42))
    assert(Edn.parse("-7.5") === EDouble(-7.5))
    assert(Edn.parse("1e3") === EDouble(1000.0))
    assert(Edn.parse("\"a \\\"b\\\" c\"") === EStr("a \"b\" c"))
    assert(Edn.parse(":unifydb/txInstant") === EKw("unifydb/txInstant"))
    assert(Edn.parse("?who") === ESym("?who"))
    assert(Edn.parse("[1, 2, 3] ; tail comment") ===
      EVec(Vector(ELong(1), ELong(2), ELong(3))))
    assert(Edn.parse("{:a (f ?x) :b [_]}") ===
      EMap(Vector(
        EKw("a") -> ELst(Vector(ESym("f"), ESym("?x"))),
        EKw("b") -> EVec(Vector(ESym("_"))))))
    assertThrows[IllegalArgumentException](Edn.parse("[1 2"))
    assertThrows[IllegalArgumentException](Edn.parse("1 2"))
  }

  test("query reader: clauses, predicates, binding fns, find aggregates") {
    val q = QueryText.parseQuery(
      """{:find [?n (count ?e)]
         :where [[?e :name ?n]
                 [:or [?e :town "slumerville"] [?e :town "cambridge"]]
                 [?e :salary ?s]
                 [(< 20000 ?s)]
                 [(* ?s 2) ?double]
                 [:not [?e :town "boston"]]]}""")
    assert(q.find === Seq(FVar(V("n"), "n"), FAgg("count", V("e"), "count_e")))
    assert(q.where === And(
      Pattern(V("e"), C("name"), V("n")),
      Or(Pattern(V("e"), C("town"), C("slumerville")),
        Pattern(V("e"), C("town"), C("cambridge"))),
      Pattern(V("e"), C("salary"), V("s")),
      Pred("<", C(20000), V("s")),
      FnBind("*", V("double"), V("s"), C(2)),
      Not(Pattern(V("e"), C("town"), C("boston")))))
  }

  test("reference lives-near rules text runs end-to-end (incl. (:same ?x ?x))") {
    // the reference's rule fixture shape (query_test.clj:135-140) on
    // the town encoding; exercises keyword rule names, rule app inside
    // :not, and the duplicate-head-param :same rule
    val out = Compiler.run(employees, QueryText.parseQuery(
      """{:find [?who]
         :where [(:lives-near ?who ?target)
                 [?target :name "Ben Bitdiddle"]]
         :rules [[(:lives-near ?p1 ?p2)
                  [?p1 :town ?t]
                  [?p2 :town ?t]
                  [:not (:same ?p1 ?p2)]]
                 [(:same ?x ?x)]]}"""))(spark)
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("reference tx-data text transacts end-to-end: adds, map forms, refs, tagged-id retract") {
    import graft.transact.Transactor
    val sess = Transactor.emptySession(spark)
    // the reference's transact fixture verbatim (transact_test.clj:21-25)
    // plus a nested map form; "ben" in value position resolves as the
    // temp id (gen-temp-ids rule)
    sess.transact(QueryText.parseTxData(
      """[[:unifydb/add "ben" :name "Ben Bitdiddle"]
         [:unifydb/add "ben" :salary 60000]
         [:unifydb/add "alyssa" :name "Alyssa P. Hacker"]
         [:unifydb/add "alyssa" :salary 40000]
         [:unifydb/add "alyssa" :supervisor "ben"]
         {:unifydb/id "lem" :name "Lem E. Tweakit"
          :address {:town "slumerville"}}]""", sess)): Unit
    val boss = Compiler.run(Db(sess.db), QueryText.parseQuery(
      """{:find [?n]
         :where [[?e :supervisor ?b] [?b :name "Ben Bitdiddle"] [?e :name ?n]]}"""))(spark)
    assert(boss.collect().map(_.getString(0)).toSeq === Seq("Alyssa P. Hacker"))
    val town = Compiler.run(Db(sess.db), QueryText.parseQuery(
      """{:find [?t]
         :where [[?e :name "Lem E. Tweakit"] [?e :address ?a] [?a :town ?t]]}"""))(spark)
    assert(town.collect().map(_.getString(0)).toSeq === Seq("slumerville"))
    // tagged-id retraction (the reference prints ids as #unifydb/id N)
    val alyssa = Compiler.run(Db(sess.db), QueryText.parseQuery(
      """{:find [?e] :where [[?e :name "Alyssa P. Hacker"]]}"""))(spark)
      .collect()(0).getLong(0)
    sess.transact(QueryText.parseTxData(
      s"""[[:unifydb/retract #unifydb/id $alyssa :salary 40000]]""", sess)): Unit
    val sal = Compiler.run(Db(sess.db), QueryText.parseQuery(
      s"""{:find [?s] :where [[?e :name "Alyssa P. Hacker"] [?e :salary ?s]]}"""))(spark)
    assert(sal.collect().isEmpty, "retracted salary fact must be gone")
  }

  test("pattern pad-clause: 1/2-element clauses pad with wildcards (query.clj pad-clause)") {
    val q = QueryText.parseQuery(
      """{:find [?e] :where [[?e :name] [?e]]}""")
    assert(q.where === And(
      Pattern(V("e"), C("name"), W),
      Pattern(V("e"), W, W)))
  }

  test("reference doc-store pull text runs verbatim (query_test.clj:521-570)") {
    import graft.core.Schema
    import graft.transact.Transactor
    // the reference doc-store fixture re-transacted: Alice with
    // card-many friends (Bob, Carl) and a status ref; Carl has his own
    // status; Bob has none
    val sess = Transactor.emptySession(spark)
    sess.transact(Seq(Transactor.MapForm(Seq(
      Schema.SchemaAttr -> "friends",
      Schema.CardinalityAttr -> Schema.CardinalityMany))))
    val r = sess.transact(Seq(
      Transactor.MapForm(Seq("name" -> "Alice", "favorite-color" -> "red",
        "status" -> Transactor.MapForm(Seq("text" -> "Feeling good"))),
        tempId = Some("alice")),
      Transactor.MapForm(Seq("name" -> "Bob", "favorite-color" -> "green"),
        tempId = Some("bob")),
      Transactor.MapForm(Seq("name" -> "Carl", "favorite-color" -> "yellow",
        "status" -> Transactor.MapForm(Seq("text" -> "Feeling bad"))),
        tempId = Some("carl"))))
    val (alice, bob, carl) =
      (r.tempIds("alice"), r.tempIds("bob"), r.tempIds("carl"))
    sess.transact(Seq(
      Transactor.Add(alice, "friends", sess.EntityRef(bob)),
      Transactor.Add(alice, "friends", sess.EntityRef(carl))))
    val db = Db(Schema.applySchema(sess.db))

    // reference query 1 VERBATIM: :name collides across levels, so the
    // text face compiles the nested shape — one struct column, arrays
    // of structs for the card-many friends ref (sorted; the engine's
    // deterministic order), null-filled where the reference omits keys
    val nested = Compiler.run(db, QueryText.parseQuery(
      """{:find [(pull ?e [:name
                           :favorite-color
                           {:status [:text]}
                           {:friends [:name
                                      :favorite-color
                                      {:status [:text]}]}])]
         :where [[?e :name "Alice"]]}"""))(spark).collect()
    assert(nested.length === 1)
    val p = nested(0).getStruct(nested(0).fieldIndex("pulled"))
    assert(p.getString(p.fieldIndex("name")) === "Alice")
    assert(p.getString(p.fieldIndex("favorite-color")) === "red")
    assert(p.getStruct(p.fieldIndex("status")).getString(0) === "Feeling good")
    val friends = p.getSeq[org.apache.spark.sql.Row](p.fieldIndex("friends"))
    assert(friends.map(f => (f.getString(0), f.getString(1))) ===
      Seq(("Bob", "green"), ("Carl", "yellow")))
    assert(friends(0).isNullAt(2), "Bob has no status (reference omits the key)")
    assert(friends(1).getStruct(2).getString(0) === "Feeling bad")

    // reference query 2 VERBATIM: collision-free → flat column
    val flat = Compiler.run(db, QueryText.parseQuery(
      """{:find [(pull ?e [:name])] :where [[?e :name _]]}"""))(spark)
    assert(flat.columns.toSeq === Seq("name"))
    assert(flat.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("Alice", "Bob", "Carl"))

    // reference query 3 shape: MULTI-pull over the same var + a
    // tagged-id predicate (`#unifydb/id N` in a :where term)
    val multi = Compiler.run(db, QueryText.parseQuery(
      s"""{:find [(pull ?e [:name]) (pull ?e [:favorite-color])]
          :where [[?e _ _]
                  [(= ?e #unifydb/id $alice)]]}"""))(spark).collect()
    assert(multi.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("Alice", "red")))

    // tagged id in :bind (constVal's ETagged case)
    val viaBind = Compiler.run(db, QueryText.parseQuery(
      s"""{:find [?n] :where [[?who :name ?n]]
          :bind {who #unifydb/id $carl}}"""))(spark)
    assert(viaBind.collect().map(_.getString(0)).toSeq === Seq("Carl"))
  }

  test("sort-by aggregate :desc, limit and bind text forms") {
    val top = Compiler.run(employees, QueryText.parseQuery(
      """{:find [?t (count ?p)]
         :where [[?p :town ?t]]
         :sort-by [(count ?p) :desc]
         :limit 1}"""))(spark)
    assert(top.columns.toSeq === Seq("t", "count_p"))
    assert(top.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("slumerville", 2L)))

    val bound = Compiler.run(employees, QueryText.parseQuery(
      """{:find [?town]
         :where [[?e :name ?n] [?e :town ?town]]
         :bind {n "Alyssa P. Hacker"}}"""))(spark)
    assert(bound.collect().map(_.getString(0)).toSeq === Seq("cambridge"))
  }
}
