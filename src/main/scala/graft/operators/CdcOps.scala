package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC MERGE semantics (SURVEY.md §2 q43) — the lakehouse
  * `MERGE INTO` applied as a DataFrame operator: a changes batch with
  * an op column ('U' update / 'D' delete / 'I' insert) merges into a
  * base table by key. Matched 'D' rows drop, matched 'U' rows take
  * the changes batch's non-null payload columns, 'I' rows append
  * projected onto the base schema (absent columns null).
  *
  * Scale shape: the base table NEVER shuffles — one scan, one
  * broadcast hash join against the (small, by CDC contract) changes
  * batch, a scan-local projection, and a union. The file-rewrite half
  * of a real lakehouse MERGE is [[graft.sources.MicroBlockWriter]] /
  * mb_compact territory; this operator is the semantic join both
  * share. Insert keys are the caller's contract to keep disjoint from
  * base keys (like MERGE's NOT MATCHED clause, each source row must
  * match its branch unambiguously).
  */
object CdcOps {

  /** Apply `changes(key, opCol, payload…)` to `base`: returns the
    * merged table with `base`'s exact schema. */
  def mergeCdc(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "_op"): DataFrame = {
    require(changes.columns.contains(opCol), s"changes needs an '$opCol' column")
    val baseCols = base.columns.filterNot(_ == key)
    val chCols = changes.columns.toSet
    def chName(c: String) = s"_ch_$c"
    val ch = changes.columns.foldLeft(changes) { (df, c) =>
      if (c == key) df else df.withColumnRenamed(c, chName(c))
    }
    val op = col(chName(opCol))

    val merged = base.join(broadcast(ch), Seq(key), "left")
      .filter(op.isNull || op =!= "D")
      .select(col(key) +: baseCols.map { c =>
        if (chCols(c))
          when(op === "U" && col(chName(c)).isNotNull, col(chName(c)))
            .otherwise(col(c)).as(c)
        else col(c)
      }: _*)
    val inserts = ch.filter(op === "I")
      .select(col(key) +: baseCols.map { c =>
        val src: Column = if (chCols(c)) col(chName(c)) else lit(null)
        src.cast(base.schema(c).dataType).as(c)
      }: _*)
    merged.unionByName(inserts)
  }
}
