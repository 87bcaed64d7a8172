package graft.datalog

import graft.core.FactDb
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pull expressions — nested entity retrieval, the Spark re-expression
  * of /root/reference/src/unifydb/query/pull.clj.
  *
  * The reference compiles a pull into generated sub-queries constrained
  * by the parent result's entity ids and reassembles maps on the
  * driver. Here each pull level is ONE left join per attribute group
  * against the snapshot (attribute-pruned scans), and nesting recurses
  * through ref attributes; cardinality-many attrs — scalar AND ref —
  * aggregate to a sorted array per entity (`fix-cardinalities`,
  * pull.clj:148-170: the reference vectors ANY card-many attr, not just
  * refs). Everything stays distributed — no driver-side reassembly.
  */
object Pull {

  /** Pull specification: scalar attrs + nested pulls through ref attrs. */
  final case class Spec(attrs: Seq[String], refs: Seq[(String, Spec)] = Nil)

  /** Flat pull: one output column per (possibly nested) attr, named by
    * the attr itself (callers rename as needed). `ids` must expose an
    * `e` column of entity ids. */
  def pullFlat(db: FactDb, ids: DataFrame, spec: Spec,
               asOfTx: Long = Long.MaxValue): DataFrame = {
    val snap = db.snapshot(asOfTx)
    def level(df: DataFrame, eCol: String, s: Spec): DataFrame = {
      val withAttrs = s.attrs.foldLeft(df) { (acc, attr) =>
        val base = snap.filter(col("a") === attr)
          .select(col("e").as(eCol), col(db.slot(attr)).as(attr))
        // card-many scalar attrs come back as ONE sorted array per
        // entity (pull.clj fix-cardinalities), never duplicated parents
        val vals =
          if (db.cardMany.contains(attr))
            base.groupBy(col(eCol))
              .agg(sort_array(collect_list(col(attr))).as(attr))
          else base
        acc.join(vals, Seq(eCol), "left")
      }
      s.refs.foldLeft(withAttrs) { case (acc, (refAttr, sub)) =>
        val childCol = refAttr + "__e"
        val refs = snap.filter(col("a") === refAttr)
          .select(col("e").as(eCol), col("vref").as(childCol))
        level(acc.join(refs, Seq(eCol), "left"), childCol, sub)
          .drop(childCol)
      }
    }
    level(ids, "e", spec)
  }

  /** Nested pull: one `pulled` struct column per root entity, arrays of
    * structs for cardinality-many ref attrs. */
  def pullNested(db: FactDb, ids: DataFrame, spec: Spec,
                 asOfTx: Long = Long.MaxValue): DataFrame = {
    val snap = db.snapshot(asOfTx)

    def build(idsDf: DataFrame, eCol: String, s: Spec, out: String): DataFrame = {
      var acc = idsDf
      val fields = scala.collection.mutable.ArrayBuffer.empty[Column]
      s.attrs.foreach { attr =>
        val base = snap.filter(col("a") === attr)
          .select(col("e").as(eCol), col(db.slot(attr)).as(attr))
        val vals =
          if (db.cardMany.contains(attr))
            base.groupBy(col(eCol))
              .agg(sort_array(collect_list(col(attr))).as(attr))
          else base
        acc = acc.join(vals, Seq(eCol), "left")
        fields += col(attr)
      }
      s.refs.foreach { case (refAttr, sub) =>
        val childCol = refAttr + "__e"
        val many = db.cardMany.contains(refAttr)
        val refsDf = snap.filter(col("a") === refAttr)
          .select(col("e").as(eCol), col("vref").as(childCol))
        val childIds = refsDf.select(col(childCol).as("e")).distinct()
        val sub0 = build(childIds, "e", sub, refAttr)
          .withColumnRenamed("e", childCol)
        val joined = refsDf.join(sub0, Seq(childCol), "left")
        val perParent =
          if (many)
            joined.groupBy(col(eCol))
              .agg(sort_array(collect_list(col(refAttr))).as(refAttr))
          else joined.select(col(eCol), col(refAttr))
        acc = acc.join(perParent, Seq(eCol), "left")
        fields += col(refAttr)
      }
      val cleanup = s.attrs ++ s.refs.map(_._1)
      acc.withColumn(out, struct(fields.toSeq: _*)).drop(cleanup: _*)
    }

    build(ids, "e", spec, "pulled")
  }
}
