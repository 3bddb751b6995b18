package graft.pii

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Carpet-core: PII removal as pure projection rewrites (SURVEY.md §2.2).
  *
  * Every action here is a narrow `select` — no shuffle, no UDF, fully
  * codegen'd and column-pruned, so cost is O(bytes of the touched columns)
  * and the plan is identical at 100 TB: a single map-only stage over the
  * parquet scan.
  *
  * Column paths use dots for nesting (`"address.street"`). Nested actions
  * rebuild the enclosing `StructType` recursively — Spark has no built-in
  * "drop nested field everywhere" (`dropFields` exists on Column but we
  * still need the schema walk to find paths and preserve order/nullability).
  */
object Redact {

  /** One redaction action targeting a (possibly nested) column path. */
  sealed trait Action { def path: String }
  /** Remove the column entirely (schema changes). */
  final case class Drop(path: String) extends Action
  /** Replace every value with NULL, keeping the type. */
  final case class Nullify(path: String) extends Action
  /** Replace every value with a constant (e.g. "[REDACTED]"). */
  final case class Constant(path: String, value: Any) extends Action
  /** Stable pseudonym: sha2-256 of value + salt (joinable across tables,
    * not reversible without the salt). */
  final case class HashPseudonym(path: String, salt: String) extends Action
  /** Keep only the last `keep` characters, mask the rest. */
  final case class PartialMask(path: String, keep: Int, maskChar: String = "*")
      extends Action
  /** Apply `masked` only where `condition` holds; pass through otherwise. */
  final case class When(path: String, condition: Column, masked: Column)
      extends Action

  /** The separator for hash input is a non-printing unit separator so that
    * ("ab","c") and ("a","bc") can't collide when concatenated with salt. */
  private val Sep = "\u001f"

  def hashColumn(c: Column, salt: String): Column =
    sha2(concat_ws(Sep, c.cast("string"), lit(salt)), 256)

  def partialMaskColumn(c: Column, keep: Int, maskChar: String = "*"): Column = {
    val s = c.cast("string")
    when(s.isNull, lit(null).cast("string"))
      .otherwise(
        concat(
          rpad(lit(""), greatest(length(s) - lit(keep), lit(0)), lit(maskChar)),
          substring(s, -keep, keep)))
  }

  /** Apply a list of actions to a DataFrame. Top-level and nested paths are
    * both supported; unknown paths throw (a silent no-op would mean PII
    * survives — fail closed). */
  def apply(df: DataFrame, actions: Seq[Action]): DataFrame = {
    val byPath = actions.map(a => a.path -> a).toMap
    require(byPath.size == actions.size, "duplicate action paths")
    actions.foreach { a =>
      require(hasPath(df.schema, a.path.split('.').toList),
        s"no such column path: ${a.path}")
    }
    val cols = df.schema.fields.toSeq.flatMap { f =>
      rewrite(col(f.name), f, Nil, byPath)
    }
    df.select(cols: _*)
  }

  private def hasPath(schema: StructType, path: List[String]): Boolean =
    path match {
      case Nil => false
      case head :: rest =>
        schema.fields.find(_.name == head) match {
          case None => false
          case Some(f) =>
            if (rest.isEmpty) true
            else f.dataType match {
              case st: StructType => hasPath(st, rest)
              case ArrayType(st: StructType, _) => hasPath(st, rest)
              case _ => false
            }
        }
    }

  /** Returns None when the field is dropped; Some(column aliased to the
    * field name) otherwise. Recurses into structs to rebuild them. */
  private def rewrite(c: Column, field: StructField, prefix: Seq[String],
      byPath: Map[String, Action]): Option[Column] = {
    val path = (prefix :+ field.name).mkString(".")
    byPath.get(path) match {
      case Some(_: Drop) => None
      case Some(_: Nullify) => Some(lit(null).cast(field.dataType).as(field.name))
      case Some(Constant(_, v)) => Some(lit(v).cast(field.dataType).as(field.name))
      case Some(HashPseudonym(_, salt)) => Some(hashColumn(c, salt).as(field.name))
      case Some(PartialMask(_, keep, mc)) =>
        Some(partialMaskColumn(c, keep, mc).as(field.name))
      case Some(When(_, cond, masked)) =>
        Some(when(cond, masked).otherwise(c).as(field.name))
      case None =>
        field.dataType match {
          case st: StructType
              if byPath.keys.exists(_.startsWith(path + ".")) =>
            Some(rebuildStruct(c, st, path, byPath).as(field.name))
          case ArrayType(st: StructType, containsNull)
              if byPath.keys.exists(_.startsWith(path + ".")) =>
            // PII inside an array of structs: rebuild every element
            // (path addresses the element field, e.g. "contacts.email")
            Some(when(c.isNull, lit(null).cast(ArrayType(
                droppedType(st, path, byPath), containsNull)))
              .otherwise(transform(c, elem =>
                when(elem.isNull, lit(null).cast(droppedType(st, path, byPath)))
                  .otherwise(rebuildStruct(elem, st, path, byPath))))
              .as(field.name))
          case _ => Some(c.as(field.name))
        }
    }
  }

  /** Rebuild a struct value applying nested actions below `path`. */
  private def rebuildStruct(c: Column, st: StructType, path: String,
      byPath: Map[String, Action]): Column = {
    val kids = st.fields.toSeq.flatMap { kf =>
      rewrite(c.getField(kf.name), kf, path.split('.').toSeq, byPath)
    }
    require(kids.nonEmpty, s"all fields of struct $path dropped")
    // preserve outer nullability: a null struct stays null
    when(c.isNull, lit(null).cast(droppedType(st, path, byPath)))
      .otherwise(struct(kids: _*))
  }

  /** The struct type after Drop actions below `path` are applied. */
  private def droppedType(st: StructType, path: String,
      byPath: Map[String, Action]): StructType =
    StructType(st.fields
      .filter(kf => !byPath.get(path + "." + kf.name).exists(_.isInstanceOf[Drop]))
      .map(kf => rewriteType(kf, path, byPath)))

  private def rewriteType(f: StructField, parent: String,
      byPath: Map[String, Action]): StructField =
    f.dataType match {
      case st: StructType =>
        val p = parent + "." + f.name
        f.copy(dataType = StructType(
          st.fields.filter(kf => !byPath.get(p + "." + kf.name)
            .exists(_.isInstanceOf[Drop]))
            .map(kf => rewriteType(kf, p, byPath))))
      case ArrayType(st: StructType, cn) =>
        val p = parent + "." + f.name
        f.copy(dataType = ArrayType(StructType(
          st.fields.filter(kf => !byPath.get(p + "." + kf.name)
            .exists(_.isInstanceOf[Drop]))
            .map(kf => rewriteType(kf, p, byPath))), cn))
      case _ => f
    }
}
