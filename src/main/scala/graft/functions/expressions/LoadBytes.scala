package graft.functions.expressions

import java.io.IOException

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import graft.operators.SerializableHadoopConf
import graft.sources.PayloadLoader

/** Media-payload load as a Catalyst expression:
  * `load_bytes(path)` reads the file at `path` (any Hadoop
  * FileSystem) and yields its bytes — the declarative form of the
  * reference's per-sample payload read
  * (DPF/dataloaders/files_dataset.py:74-107).
  *
  * Making the load an EXPRESSION (rather than only a mapPartitions
  * stage) is what lets the optimizer reason about it:
  * [[graft.plans.HoistPayloadLoad]] re-plans projections so the load
  * runs after joins/filters/limits — bytes are fetched only for rows
  * that survive, and never ride a shuffle (SURVEY §4.2's
  * payload-load pushdown).
  *
  * Declared NON-deterministic: it reads an external, mutable
  * filesystem, and the flag stops Catalyst from duplicating the call
  * into multiple consumers or folding it into unintended positions —
  * only [[graft.plans.HoistPayloadLoad]] moves it. Consequence: the
  * expression may appear in projections only (Spark rejects
  * nondeterministic filter/join conditions) — compute the column
  * first, then filter on it.
  *
  * `lenient = false` (`load_bytes`): IO failure fails the task — for
  * pipelines where a missing payload is a data bug.
  * `lenient = true` (`try_load_bytes`): IO failure yields null — the
  * reference's drop-on-error discipline; follow with a null filter or
  * a validator.
  *
  * Tar member paths (`archive.tar!member`) are REFUSED, not served:
  * per-row member access would re-scan the archive for every row
  * (O(archive) each). Tar payloads belong to the batched one-pass
  * loaders — `Processor.applyDataFilter` or the `tar` DataSourceV2
  * source — and the error message says so.
  *
  * I/O-bound, so codegen is a reference-object shim (the JIT has
  * nothing to win inside a filesystem call).
  */
case class LoadBytes(child: Expression, conf: SerializableHadoopConf,
    lenient: Boolean) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def nullable: Boolean = true

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string path, got $t")
    }

  override def prettyName: String =
    if (lenient) "try_load_bytes" else "load_bytes"

  @transient private lazy val loader = new PayloadLoader(conf.get())

  override def nullSafeEval(input: Any): Any = {
    val path = input.toString
    if (PayloadLoader.splitTarPath(path).isDefined)
      throw new IllegalArgumentException(
        s"$prettyName does not serve tar member paths ($path): per-row " +
          "member access re-scans the archive per row. Use " +
          "Processor.applyDataFilter (one pass per archive) or " +
          "spark.read.format(\"tar\") instead.")
    try loader.loadFile(path)
    catch {
      case e: IOException => if (lenient) null else throw e
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("loadBytes", this)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = (byte[]) $ref.nullSafeEval($a);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LoadBytes = copy(child = newChild)
}
