package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.CanonicalSchema.{DslType, TText, TInt, TReal, TDatetime, dslTypeOf}

/** The reference's JSON filter DSL, re-expressed as a driver-side compiler
  * that emits Spark [[Column]] predicates instead of SQL strings.
  *
  * Shapes accepted (reference: docs/filters.md, validation.py:154-180,
  * utils.py:262-334):
  *   - flat:    {"year": 2022, "fuel": "Gas"}
  *   - nested:  {"year": {"gte": 2010}, "fuel": {"like": "%gas%"}}
  *   - $or:     {"$or": [{...}, {...}], "year": {"gt": 2020}}
  *     ($or as a dict is tolerated and treated as a list of single-field
  *      groups, reference: validation.py:160-180)
  *
  * Semantics:
  *   - all ops within a field AND-ed; all fields AND-ed (utils.py:282-303)
  *   - result = (base) AND (or-group-1 OR or-group-2 OR ...) (utils.py:306-334)
  *   - TEXT comparisons are case-insensitive — the reference appends
  *     COLLATE NOCASE to every TEXT clause (utils.py:298-299); here we
  *     lower() both sides
  *   - values are validated + cast to the column's declared type before
  *     compilation (validation.py:184-249)
  */
object FilterDsl {

  sealed abstract class Op(val name: String)
  case object Eq   extends Op("eq")
  case object Neq  extends Op("neq")
  case object Lt   extends Op("lt")
  case object Lte  extends Op("lte")
  case object Gt   extends Op("gt")
  case object Gte  extends Op("gte")
  case object Like extends Op("like")

  val allOps: Map[String, Op] =
    Seq(Eq, Neq, Lt, Lte, Gt, Gte, Like).map(o => o.name -> o).toMap

  /** Operator policy per declared type (reference: settings.py:65-69 —
    * `like` is TEXT-only; DATETIME columns are never queryable). */
  private def opsFor(t: DslType): Set[Op] = t match {
    case TText             => Set(Eq, Neq, Lt, Lte, Gt, Gte, Like)
    case TInt | TReal      => Set(Eq, Neq, Lt, Lte, Gt, Gte)
    case TDatetime         => Set.empty
  }

  final case class FieldFilter(column: String, op: Op, value: Any)
  /** One AND-group of field filters. */
  final case class Group(fields: Vector[FieldFilter])
  /** base AND (ors reduced by OR). */
  final case class FilterQuery(base: Group, ors: Vector[Group])

  final case class DslException(msg: String) extends IllegalArgumentException(msg)

  // ---------------------------------------------------------------- parse

  /** Parse a JSON filter document string. */
  def parseJson(json: String): FilterQuery = {
    val parsed = Json.parse(json) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _            => throw DslException("filters must be a JSON object")
    }
    normalize(parsed)
  }

  /** Normalize a raw filter document (flat values nested, $or split out).
    * Reference: validation.py:154-180 + utils.py:262-279. */
  def normalize(raw: Map[String, Any]): FilterQuery = {
    val (orPart, basePart) = raw.partition(_._1 == "$or")
    val base = Group(basePart.toVector.flatMap { case (k, v) => nestField(k, v) })
    val ors: Vector[Group] = orPart.get("$or") match {
      case None => Vector.empty
      case Some(lst: Vector[_]) =>
        lst.toVector.map {
          case m: Map[_, _] =>
            Group(m.asInstanceOf[Map[String, Any]].toVector.flatMap {
              case (k, v) => nestField(k, v)
            })
          case other => throw DslException(s"$$or entries must be objects, got: $other")
        }
      case Some(m: Map[_, _]) =>
        // dict form tolerated: each field becomes its own single-field group
        m.asInstanceOf[Map[String, Any]].toVector.map {
          case (k, v) => Group(nestField(k, v))
        }
      case Some(other) => throw DslException(s"$$or must be a list or object, got: $other")
    }
    FilterQuery(base, ors)
  }

  /** {"year": 2020} -> eq; {"year": {"gte": 2010, "lt": 2020}} -> two ops. */
  private def nestField(column: String, v: Any): Vector[FieldFilter] = v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toVector.map { case (opName, value) =>
        val op = allOps.getOrElse(opName,
          throw DslException(s"invalid operator '$opName' for column '$column'"))
        FieldFilter(column, op, value)
      }
    case scalar => Vector(FieldFilter(column, Eq, scalar))
  }

  // ------------------------------------------------------------- validate

  /** Validate a parsed query against a schema and an optional set of
    * queryable columns, casting values to the declared column type.
    * Reference: validation.py:184-249. */
  def validate(q: FilterQuery, schema: StructType,
               queryable: Option[Set[String]] = None): FilterQuery = {
    val types: Map[String, DslType] =
      schema.fields.map(f => f.name -> dslTypeOf(f.dataType)).toMap
    def checkGroup(g: Group): Group = Group(g.fields.map { f =>
      val t = types.getOrElse(f.column,
        throw DslException(s"unknown column '${f.column}'"))
      queryable.foreach { qs =>
        if (!qs.contains(f.column))
          throw DslException(s"column '${f.column}' is not queryable for this table")
      }
      if (!opsFor(t).contains(f.op))
        throw DslException(s"operator '${f.op.name}' not allowed for column '${f.column}'")
      FieldFilter(f.column, f.op, castValue(f.value, t, f))
    })
    FilterQuery(checkGroup(q.base), q.ors.map(checkGroup))
  }

  /** Cast a filter value to the column's declared type; `like` requires a
    * string pattern (reference: validation.py:238-247, settings.py:58-63). */
  private def castValue(v: Any, t: DslType, f: FieldFilter): Any = {
    if (f.op == Like) v match {
      case s: String => return s
      case _ => throw DslException(s"'like' requires a string pattern on '${f.column}'")
    }
    (t, v) match {
      case (TText, s: String)  => s
      case (TText, other)      => String.valueOf(other)
      case (TInt, n: Long)     => n
      case (TInt, n: Int)      => n.toLong
      case (TInt, d: Double)   =>
        if (d == d.toLong.toDouble) d.toLong
        else throw DslException(s"non-integer value $d for integer column '${f.column}'")
      case (TInt, s: String)   =>
        try s.trim.toLong
        catch { case _: NumberFormatException =>
          throw DslException(s"cannot cast '$s' to integer for '${f.column}'") }
      case (TReal, n: Long)    => n.toDouble
      case (TReal, n: Int)     => n.toDouble
      case (TReal, d: Double)  => d
      case (TReal, s: String)  =>
        try s.trim.toDouble
        catch { case _: NumberFormatException =>
          throw DslException(s"cannot cast '$s' to real for '${f.column}'") }
      case (TDatetime, _)      =>
        throw DslException(s"datetime column '${f.column}' is not queryable")
      case (_, other)          =>
        throw DslException(s"unsupported value $other for '${f.column}'")
    }
  }

  // -------------------------------------------------------------- compile

  /** Compile one field filter to a Spark Column predicate. TEXT comparisons
    * are case-insensitive, mirroring COLLATE NOCASE (utils.py:298-299). */
  private def compileField(f: FieldFilter, schema: StructType): Column = {
    val isText = dslTypeOf(schema(f.column).dataType) == TText
    val c = col(f.column)
    def lhs: Column = if (isText) lower(c) else c
    def rhs: Column = if (isText) lower(lit(f.value)) else lit(f.value)
    f.op match {
      case Eq   => lhs === rhs
      case Neq  => lhs =!= rhs
      case Lt   => lhs < rhs
      case Lte  => lhs <= rhs
      case Gt   => lhs > rhs
      case Gte  => lhs >= rhs
      case Like => lower(c).like(String.valueOf(f.value).toLowerCase)
    }
  }

  private def compileGroup(g: Group, schema: StructType): Option[Column] =
    g.fields.map(compileField(_, schema)).reduceOption(_ && _)

  /** Compile a validated query to a single Column predicate:
    * (base) AND (or1 OR or2 OR ...). Empty query compiles to lit(true). */
  def compile(q: FilterQuery, schema: StructType): Column = {
    val base = compileGroup(q.base, schema)
    val ors = q.ors.flatMap(compileGroup(_, schema)).reduceOption(_ || _)
    (base, ors) match {
      case (Some(b), Some(o)) => b && o
      case (Some(b), None)    => b
      case (None, Some(o))    => o
      case (None, None)       => lit(true)
    }
  }

  /** One-shot: JSON string -> validated -> Column. */
  def compileJson(json: String, schema: StructType,
                  queryable: Option[Set[String]] = None): Column =
    compile(validate(parseJson(json), schema, queryable), schema)
}
