package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the expectation-check stage a
  * training-data pipeline runs before promoting a corpus snapshot
  * (null keys, domain ranges, PK uniqueness, FK closure). The contract
  * form (x172) is one UNION ALL branch per rule for dialect clarity —
  * one table scan PER RULE; this operator classifies rules by what
  * they need:
  *
  *  - row-local rules (not-null, range, custom predicate) fuse into
  *    ONE conditional aggregate over ONE scan — at 100 TB the audit is
  *    priced by fact-table reads, so k rules cost one pass, not k;
  *  - uniqueness is a count vs count-distinct on the same fused pass;
  *  - referential rules are anti-join probes against the dimension —
  *    irreducibly a join, broadcast when the dim is small.
  *
  * Same output shape as the SQL form: (rule, violations, checked),
  * sorted by rule — x173 shares x172's oracle (the x161 policy).
  */
object DataQuality {

  sealed trait Rule { def name: String }
  /** violation := the column is NULL. */
  case class NotNull(name: String, col: String) extends Rule
  /** violation := value outside [lo, hi] (NULLs are NOT violations —
    * declare a NotNull rule for that, like SQL CHECK semantics). */
  case class InRange(name: String, col: String, lo: Double, hi: Double) extends Rule
  /** violation := any arbitrary row predicate evaluating TRUE. */
  case class Violates(name: String, pred: Column) extends Rule
  /** violation := duplicate NON-NULL value of the key column
    * (count(col) - ndv(col): both sides exclude NULLs, so a NULL key
    * is not a "duplicate" — declare a NotNull rule to police NULL keys;
    * ADVICE r5 #2). */
  case class Unique(name: String, col: String) extends Rule
  /** violation := row whose key has no match in `dim.col` (NULL keys
    * don't violate FK, matching SQL REFERENCES semantics). */
  case class ForeignKey(name: String, col: String, dim: DataFrame, dimCol: String)
    extends Rule

  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // coalesce to 0: sum() over ZERO rows is NULL, and an audit of an
    // empty table/partition — exactly the pre-promotion gate this
    // operator exists for — must report (rule, 0, 0), not NPE on getLong
    def cnt(pred: Column): Column =
      coalesce(sum(when(pred, lit(1L)).otherwise(lit(0L))), lit(0L))

    // One fused pass: every row-local + uniqueness rule becomes one
    // aggregate column over the same scan — and each FK rule's
    // "checked" denominator (non-null key count) rides the same pass
    // for free, so an FK rule costs ONE anti-join scan, not two.
    val fused: Seq[(String, Column)] = rules.collect {
      case NotNull(n, c) => n -> cnt(col(c).isNull)
      case InRange(n, c, lo, hi) =>
        n -> cnt(col(c).isNotNull && !col(c).between(lo, hi))
      case Violates(n, p) => n -> cnt(coalesce(p, lit(false)))
      case Unique(n, c) => n -> (count(col(c)) - count_distinct(col(c)))
    }
    val fks = rules.collect { case fk: ForeignKey => fk }
    val fkChecked: Seq[(String, Column)] =
      fks.map(fk => s"__fk_${fk.name}" -> count(col(fk.col)))
    val allAggs = fused ++ fkChecked
    val (fusedRows, fkCheckedByName) =
      if (allAggs.isEmpty) (Nil, Map.empty[String, Long])
      else {
        val aggs = allAggs.map { case (n, c) => c.as(n) } :+ count(lit(1)).as("__n")
        val row = df.agg(aggs.head, aggs.tail: _*).collect().head
        val total = row.getLong(allAggs.size)
        val fr = fused.zipWithIndex.map { case ((n, _), i) => (n, row.getLong(i), total) }
        val fc = fks.zipWithIndex.map { case (fk, i) =>
          fk.name -> row.getLong(fused.size + i)
        }.toMap
        (fr, fc)
      }

    // FK rules: one anti-join each (broadcast-able dims stay broadcast;
    // Catalyst decides). Counted lazily into driver-sized rows.
    val fkRows: Seq[(String, Long, Long)] = fks.map { fk =>
      val miss = df.where(col(fk.col).isNotNull)
        .join(fk.dim.select(col(fk.dimCol)).distinct(),
          col(fk.col) === col(fk.dimCol), "left_anti").count()
      (fk.name, miss, fkCheckedByName(fk.name))
    }

    (fusedRows ++ fkRows)
      .toDF("rule", "violations", "checked")
      .orderBy("rule")
  }
}
