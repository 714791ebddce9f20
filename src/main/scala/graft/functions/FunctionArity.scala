package graft.functions

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression

/** Wraps a session-extension function builder with an argument-count
  * check, so a user typo like `sorted_icount(ss1)` surfaces at analysis
  * time as "requires exactly 2 arguments, got 1" instead of an opaque
  * IndexOutOfBoundsException from `Seq#apply` inside the builder
  * (round-10 review finding; applied to every graft-registered
  * function for one consistent failure mode). */
object FunctionArity {
  def expect(name: String, n: Int)(
      build: Seq[Expression] => Expression): FunctionRegistry.FunctionBuilder =
    (children: Seq[Expression]) => {
      if (children.size != n) throw new IllegalArgumentException(
        s"$name requires exactly $n arguments, got ${children.size}")
      build(children)
    }
}
