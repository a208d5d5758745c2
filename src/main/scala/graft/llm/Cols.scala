package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object Cols {
  /** Let-binding for Column expressions: evaluate `value` ONCE per row and
    * reference it as a lambda variable in `body`.
    *
    * Why: CollapseProject merges stacked projections, inlining an aliased
    * expression into any lambda that references it — and a HOF lambda body
    * is re-evaluated PER ELEMENT. An expensive array construction (shingle
    * set, hash array, minhash signature) inlined into a transform over N
    * elements turns one pass into N. Binding through a single-element
    * transform makes the construction the HOF's *argument* (evaluated
    * once); inner references become lambda-variable reads.
    *
    * Measured: minhash signature over sf0.1 documents without this —
    * >170s (64× shingle rebuild, 16× signature rebuild in banding);
    * with it — single-digit seconds. */
  def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)
}
