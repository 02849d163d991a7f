package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Persisted workflow-rule registry (T5): named boolean SQL predicates
  * stored on disk, duplicate names rejected, evaluated in one pass to a
  * violations table (ref: agents/workflow_agent/workflow_main.py:84-142
  * stores named rules and rejects re-registration;
  * agents/workflow_agent/workflows.json holds the example rule).
  *
  * Storage is a tab-separated `name\tpredicate` file written with
  * temp+atomic-rename (same durability model as SnapshotStore's
  * manifest). Predicates are Spark SQL boolean expressions over the
  * target table's columns; a row VIOLATES a rule when the predicate is
  * false (the reference's rules state the invariant that must hold).
  */
final class RuleRegistry(path: String) {

  private val file = Paths.get(path)

  def rules(): Seq[(String, String)] =
    if (!Files.exists(file)) Seq.empty
    else new String(Files.readAllBytes(file), StandardCharsets.UTF_8)
      .split('\n').filter(_.nonEmpty).toSeq
      .map { line =>
        val i = line.indexOf('\t')
        if (i < 0)
          throw new IllegalStateException(
            s"malformed rule registry $path: line without name\\tpredicate separator: '$line'")
        (line.substring(0, i), line.substring(i + 1))
      }

  /** Register a named rule; re-registering an existing name fails (the
    * reference rejects duplicate workflow names).
    */
  def register(name: String, predicate: String): Unit = {
    // identifier charset only: evaluate() references the aggregate column
    // as col("v_" + name), where '.' would parse as nested-field access
    // and '`' would break quoting — reject at registration, not evaluation
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"invalid rule name (use letters/digits/underscore): '$name'")
    require(!predicate.contains('\n'), "predicate must be single-line SQL")
    val existing = rules()
    if (existing.exists(_._1 == name))
      throw new IllegalArgumentException(s"rule '$name' is already registered")
    val content = (existing :+ (name, predicate))
      .map { case (n, p) => s"$n\t$p" }.mkString("", "\n", "\n")
    Files.createDirectories(file.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Evaluate every stored rule against `df` in ONE scan (each rule is a
    * conditional-count aggregate column; the tiny per-conv result is then
    * unpivoted). Output: (rule_name, conv_id, n_violations), only convs
    * with at least one violating row for that rule. A row violates a
    * rule when its predicate is false.
    */
  def evaluate(df: DataFrame): DataFrame = {
    val rs = rules()
    require(rs.nonEmpty, "no rules registered")
    val aggs = rs.map { case (n, p) =>
      sum(when(!expr(p), 1L).otherwise(0L)).as(s"v_$n")
    }
    val counted = df.groupBy(col("conv_id")).agg(aggs.head, aggs.tail: _*)
    val stacked = rs.map { case (n, _) =>
      counted.select(
        lit(n).as("rule_name"), col("conv_id"),
        col(s"v_$n").as("n_violations"))
    }.reduce(_ union _)
    stacked.filter(col("n_violations") > 0)
  }
}
