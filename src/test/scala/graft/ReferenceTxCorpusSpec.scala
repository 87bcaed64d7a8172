package graft

import graft.core.Schema
import graft.datalog.{Compiler, QueryText}
import graft.datalog.Compiler.Db
import graft.transact.Transactor
import org.apache.spark.sql.functions.col

/** THE REFERENCE TRANSACT + SCHEMA CORPORA, END TO END: every tx
  * fixture in test/unifydb/transact_test.clj (4 deftests, 141 lines)
  * and test/unifydb/schema_test.clj (33 lines) runs from VERBATIM text
  * through the EDN transact gate (QueryText.parseTxData → Transactor),
  * with the reference's assertions re-expressed over graft's TxReport
  * — the transact-side sibling of ReferenceCorpusSpec.
  *
  * Documented model mappings (each case notes its delta in place):
  *  - ID SPACES: the reference hands out entity ids AND tx ids from
  *    one storage counter (gen-temp-ids → storage/get-next-id!), so
  *    its `db-after` `:tx-id` EQUALS `tempids["unifydb.tx"]`; graft's
  *    transactor keeps tx ids monotone in their own sequence
  *    (TxReport.txId) and the tx ENTITY takes a fresh entity id. The
  *    spec asserts the graft pair (every fact carries txId; the tx
  *    entity carries txInstant) instead of the id-equality artifact.
  *  - NEW USERS: the reference transform writes a salted SHA-512
  *    password hash INTO the log and echoes it in the report (only
  *    salt/keys are filtered, transact/filters.clj:14-25); graft
  *    derives PBKDF2 credentials (salt/stored-key/i) and filters ALL
  *    of them from the report. The spec asserts the property the
  *    reference test is about — the raw password appears nowhere —
  *    plus graft's stronger report hygiene.
  *  - NON-MAP VECTOR VALUES store their canonical EDN rendering as ONE
  *    string value (the VALUE-semantic collections mapping,
  *    ReferenceCorpusSpec / SURVEY §4).
  */
class ReferenceTxCorpusSpec extends SparkSpec {

  private def tx(sess: Transactor.Session, text: String): Transactor.TxReport =
    sess.transact(QueryText.parseTxData(text, sess))

  /** The reference's positional assertion block, shared by
    * transact-test and transact-map-form-test (the two deftests assert
    * the exact same things over the two input syntaxes,
    * transact_test.clj:30-44 and :67-81). */
  private def assertTxReport(sess: Transactor.Session,
                             r: Transactor.TxReport, before: Long): Unit = {
    val facts = r.facts
    // "Resolving temporary IDs" (:30-37)
    assert(r.tempIds.keySet === Set("ben", "alyssa", "unifydb.tx"))
    assert(r.tempIds("ben") === facts(0)._1)
    assert(r.tempIds("alyssa") === facts(2)._1)
    assert(facts(0)._1 === facts(1)._1)
    assert(facts(2)._1 === facts(3)._1)
    assert(facts(2)._1 === facts(4)._1)
    // alyssa's supervisor VALUE resolves to ben's entity id
    assert(facts(4)._3 === sess.EntityRef(facts(0)._1.asInstanceOf[Long]))
    // "Adding transaction metadata" (:38-42)
    val last = facts.last
    assert(last._1 === r.tempIds("unifydb.tx"))
    assert(last._2 === "unifydb/txInstant")
    assert(last._3.isInstanceOf[Long])
    val instant = last._3.asInstanceOf[Long]
    assert(instant >= before && instant <= System.currentTimeMillis())
    // "Returning a new DB" (:43-44) — graft id-space mapping: every
    // fact carries the report's txId, and the new db answers queries
    assert(facts.forall(_._4 == r.txId))
    val out = Compiler.run(Db(sess.db), QueryText.parseQuery(
      """{:find [?n] :where [[?e :supervisor ?b] [?b :name ?n]]}"""))(spark)
    assert(out.collect().map(_.getString(0)).toSeq === Seq("Ben Bitdiddle"))
  }

  test("transact-test: add-forms verbatim (transact_test.clj:13-46)") {
    val sess = Transactor.emptySession(spark)
    val before = System.currentTimeMillis()
    val r = tx(sess,
      """[[:unifydb/add "ben" :name "Ben Bitdiddle"]
         [:unifydb/add "ben" :salary 60000]
         [:unifydb/add "alyssa" :name "Alyssa P. Hacker"]
         [:unifydb/add "alyssa" :salary 40000]
         [:unifydb/add "alyssa" :supervisor "ben"]]""")
    assertTxReport(sess, r, before)
  }

  test("transact-map-form-test: map forms verbatim (transact_test.clj:48-83)") {
    val sess = Transactor.emptySession(spark)
    val before = System.currentTimeMillis()
    val r = tx(sess,
      """[{:unifydb/id "ben"
          :name "Ben Bitdiddle"
          :salary 60000}
         {:unifydb/id "alyssa"
          :name "Alyssa P. Hacker"
          :salary 40000
          :supervisor "ben"}]""")
    assertTxReport(sess, r, before)
  }

  // ------------------------------- deftest expand-map-forms-test :85

  /** A report's non-tx facts at the NAME level: entity ids and ref
    * values mapped back through the inverse tempid map — the form the
    * reference's expected `:add-forms` are written in (numeric ids
    * differ across sessions; the name-level sequence must not). */
  private def nameFacts(sess: Transactor.Session, r: Transactor.TxReport)
      : Seq[(Any, String, Any)] = {
    val inv = r.tempIds.map(_.swap)
    r.facts.filterNot(_._2 == "unifydb/txInstant").map { case (e, a, v, _, _) =>
      val vv = v match {
        case sess.EntityRef(id: Long) => inv.getOrElse(id, id)
        case other => other
      }
      (inv.getOrElse(e.asInstanceOf[Long], e), a, vv)
    }
  }

  /** Each expand-map-forms case: transacting the map form and the
    * reference's expected add-forms must emit the SAME name-level fact
    * sequence — order included (the reference pins emission order:
    * parent→child link before the child's facts). */
  private def expandCase(name: String, mapForm: String, addForms: String): Unit =
    test(s"expand-map-forms-test: $name (transact_test.clj:85-114)") {
      val sA = Transactor.emptySession(spark)
      val sB = Transactor.emptySession(spark)
      val got = nameFacts(sA, tx(sA, s"[$mapForm]"))
      val want = nameFacts(sB, tx(sB, addForms))
      assert(got === want)
    }

  expandCase("Basic example",
    """{:unifydb/id "foo"
       :foo "bar"
       :baz "qux"}""",
    """[[:unifydb/add "foo" :foo "bar"]
       [:unifydb/add "foo" :baz "qux"]]""")

  expandCase("Nested map",
    """{:unifydb/id "foo"
       :bar {:unifydb/id "bar"
             :baz "qux"}}""",
    """[[:unifydb/add "foo" :bar "bar"]
       [:unifydb/add "bar" :baz "qux"]]""")

  expandCase("List value",
    """{:unifydb/id "order1"
       :customer-id 1234
       :line-items [{:unifydb/id "li1" :cost 100}
                    {:unifydb/id "li2" :cost 200}]}""",
    """[[:unifydb/add "order1" :customer-id 1234]
       [:unifydb/add "order1" :line-items "li1"]
       [:unifydb/add "li1" :cost 100]
       [:unifydb/add "order1" :line-items "li2"]
       [:unifydb/add "li2" :cost 200]]""")

  expandCase("Non-map lists",
    """{:unifydb/id "foo"
       :bar [1 2 3]}""",
    """[[:unifydb/add "foo" :bar [1 2 3]]]""")

  test("expand-map-forms: non-map list stores the EDN rendering as ONE value") {
    // the collections mapping made concrete: `[1 2 3]` is one
    // VALUE-semantic fact, not three (reference stores the vector as
    // one heterogeneous value; graft stores its canonical EDN text)
    val sess = Transactor.emptySession(spark)
    val r = tx(sess, """[{:unifydb/id "foo" :bar [1 2 3]}]""")
    val barFacts = r.facts.filter(_._2 == "bar")
    assert(barFacts.size === 1)
    assert(barFacts.head._3 === "[1 2 3]")
  }

  // ------------------------------- deftest transact-user-test :116

  test("transact-user-test: credentials derived, raw password nowhere (transact_test.clj:116-141)") {
    val sess = Transactor.emptySession(spark)
    val r = tx(sess,
      """[[:unifydb/add "my-user" :unifydb/username "user"]
         [:unifydb/add "my-user" :unifydb/password "pencil"]]""")
    val facts = r.facts
    // the reference's core property: the raw password never appears —
    // not in the report (:128-132) ...
    assert(!facts.exists(_._3 == "pencil"))
    // ... and (graft extends the check) not in the log either
    assert(sess.db.log.filter(col("vstr") === "pencil").count() === 0)
    // username fact survives verbatim, in first position (:133-139)
    assert(facts.head._2 === "unifydb/username")
    assert(facts.head._3 === "user")
    // graft delta: the reference report carries a hashed-password fact
    // (count 3 incl. txInstant); graft derives PBKDF2 credentials and
    // filters ALL of them from the report (count 2) — they live only
    // in the log
    assert(facts.map(_._2) === Seq("unifydb/username", "unifydb/txInstant"))
    val userEnt = r.tempIds("my-user")
    val credAttrs = sess.db.log.filter(col("e") === userEnt)
      .select("a").collect().map(_.getString(0)).toSet
    assert(credAttrs === Set("unifydb/username", "unifydb/salt",
      "unifydb/stored-key", "unifydb/i"))
    assert(!credAttrs.contains("unifydb/password"))
  }

  // --------------------------------- schema_test.clj test-get-schema

  test("test-get-schema: get-schemas over verbatim tx text (schema_test.clj:12-33)") {
    val sess = Transactor.emptySession(spark)
    tx(sess,
      """[[:unifydb/add "foo" :unifydb/schema :foo]
         [:unifydb/add "foo" :unifydb/cardinality :cardinality/many]
         [:unifydb/add "bar" :unifydb/schema :bar]
         [:unifydb/add "bar" :unifydb/unique :unique/upsert]]""")
    // the reference queries the db at `#unifydb/id 3` (its shared-
    // counter tx id); graft's equivalent point is the latest snapshot
    // after the one transaction. Keywords store as their name strings
    // (the documented keyword mapping).
    val out = Schema.getSchemas(sess.db, Seq("foo", "bar", "baz"))
    assert(out === Map(
      "foo" -> Map("unifydb/cardinality" -> "cardinality/many",
        "unifydb/schema" -> "foo"),
      "bar" -> Map("unifydb/unique" -> "unique/upsert",
        "unifydb/schema" -> "bar")))
  }
}
