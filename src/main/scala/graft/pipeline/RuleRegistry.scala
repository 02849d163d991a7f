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
  * Each rule also carries a notification recipient list (the reference
  * parses and persists an email list per workflow,
  * ref: agents/workflow_agent/workflow_main.py:84-142 `email_list`;
  * workflows.json stores it alongside the rule) — alerts emitted by
  * `evaluate` carry the recipients so the notify step is routable.
  *
  * Storage is a tab-separated `name\tpredicate\trecipients` file written
  * with temp+atomic-rename (same durability model as SnapshotStore's
  * manifest); `recipients` is a comma-joined email list (may be empty).
  * Lines written by pre-recipient versions (two fields) load with an
  * empty recipient list. Predicates are Spark SQL boolean expressions
  * over the target table's columns; a row VIOLATES a rule when the
  * predicate is false (the reference's rules state the invariant that
  * must hold).
  */
final class RuleRegistry(path: String) {

  private val file = Paths.get(path)

  /** (name, predicate, recipients). */
  def rules(): Seq[(String, String, Seq[String])] =
    if (!Files.exists(file)) Seq.empty
    else new String(Files.readAllBytes(file), StandardCharsets.UTF_8)
      .split('\n').filter(_.nonEmpty).toSeq
      .map { line =>
        line.split('\t') match {
          case Array(n, p)     => (n, p, Seq.empty[String])
          case Array(n, p, r)  => (n, p, r.split(',').filter(_.nonEmpty).toSeq)
          case _ =>
            throw new IllegalStateException(
              s"malformed rule registry $path: expected name\\tpredicate[\\trecipients]: '$line'")
        }
      }

  /** Register a named rule with an optional notification recipient list;
    * re-registering an existing name fails (the reference rejects
    * duplicate workflow names).
    */
  def register(name: String, predicate: String, recipients: Seq[String] = Seq.empty): Unit = {
    // identifier charset only: evaluate() references the aggregate column
    // as col("v_" + name), where '.' would parse as nested-field access
    // and '`' would break quoting — reject at registration, not evaluation
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"invalid rule name (use letters/digits/underscore): '$name'")
    require(!predicate.contains('\n'), "predicate must be single-line SQL")
    // the registry file is tab-delimited: a tab inside the predicate would
    // split it into extra fields and corrupt every later rules() read
    require(!predicate.contains('\t'), "predicate must not contain tabs")
    recipients.foreach { r =>
      require(r.nonEmpty && !r.exists(c => c == '\t' || c == '\n' || c == ','),
        s"invalid recipient (no tab/newline/comma, non-empty): '$r'")
    }
    val existing = rules()
    if (existing.exists(_._1 == name))
      throw new IllegalArgumentException(s"rule '$name' is already registered")
    val content = (existing :+ ((name, predicate, recipients)))
      .map { case (n, p, r) => s"$n\t$p\t${r.mkString(",")}" }.mkString("", "\n", "\n")
    Files.createDirectories(file.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Evaluate every stored rule against `df` in ONE scan (each rule is a
    * conditional-count aggregate column; the tiny per-conv result is then
    * unpivoted). Output: (rule_name, conv_id, n_violations, recipients),
    * only convs with at least one violating row for that rule;
    * `recipients` is the rule's comma-joined notification list. A row
    * violates a rule when its predicate is false.
    */
  def evaluate(df: DataFrame): DataFrame = {
    val rs = rules()
    require(rs.nonEmpty, "no rules registered")
    val aggs = rs.map { case (n, p, _) =>
      sum(when(!expr(p), 1L).otherwise(0L)).as(s"v_$n")
    }
    val counted = df.groupBy(col("conv_id")).agg(aggs.head, aggs.tail: _*)
    val stacked = rs.map { case (n, _, r) =>
      counted.select(
        lit(n).as("rule_name"), col("conv_id"),
        col(s"v_$n").as("n_violations"),
        lit(r.mkString(",")).as("recipients"))
    }.reduce(_ union _)
    stacked.filter(col("n_violations") > 0)
  }
}
