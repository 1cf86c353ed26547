package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Translator for the expression subset the reference's ETL YAML uses
  * (predicates and `out := {...}` record constructions — see
  * demo/invoices.yaml, etl/build.go:163-216):
  *
  *   - field paths          `value.after.ID`, `left.kafka`
  *   - literals             `"u"`, 42, null, true/false
  *   - comparisons          `==  !=  <  <=  >  >=`
  *   - membership           `value.op in ["c","r"]`
  *   - boolean              `and  or  not`
  *   - record literal       `{ key: in.key, value: { ID: ... } }`
  *   - map literal + lookup `|{ "jane": 1, "bob": 2 }|[in.value.name]`
  *     (the reference declares these as consts, demo/etl.zed:1-10; YAML
  *     zed blocks carry no const scope so the literal inlines)
  *   - `cast(null, typeof(path))`  → typed null of path's static type
  *
  * Anything else can be escaped verbatim with `sql:(...)` which is handed
  * to Spark SQL — graft's shaper contract (SURVEY §7).
  *
  * Output is a Catalyst Column, so user transforms stay inside
  * whole-stage codegen like every other operator.
  */
object ZedExpr {

  sealed trait Ast
  final case class Path(parts: Seq[String]) extends Ast
  final case class StrLit(v: String) extends Ast
  final case class NumLit(v: String) extends Ast
  final case class BoolLit(v: Boolean) extends Ast
  case object NullLit extends Ast
  final case class RecordLit(fields: Seq[(String, Ast)]) extends Ast
  final case class MapLit(entries: Seq[(Ast, Ast)]) extends Ast
  final case class Lookup(m: Ast, key: Ast) extends Ast
  final case class Cmp(op: String, l: Ast, r: Ast) extends Ast
  final case class Arith(op: String, l: Ast, r: Ast) extends Ast
  final case class Index(e: Ast, i: Int) extends Ast
  final case class In(e: Ast, list: Seq[Ast]) extends Ast
  final case class And(l: Ast, r: Ast) extends Ast
  final case class Or(l: Ast, r: Ast) extends Ast
  final case class Not(e: Ast) extends Ast
  final case class CastNullTypeof(path: Path) extends Ast
  final case class RawSql(sql: String) extends Ast

  // ---------------------------------------------------------- parser
  final class Parser(input: String) {
    private var pos = 0
    private def ws(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < input.length) input(pos) else '\u0000'
    private def eat(c: Char): Unit = {
      ws(); require(peek == c, s"expected '$c' at $pos in: $input"); pos += 1
    }
    private def tryEat(s: String): Boolean = {
      ws()
      if (input.startsWith(s, pos)) { pos += s.length; true } else false
    }
    /** Consume a keyword only at a word boundary (so `order` ≠ `or`). */
    private def tryKeyword(kw: String): Boolean = {
      ws()
      val end = pos + kw.length
      if (input.startsWith(kw, pos) &&
          (end >= input.length || !(input(end).isLetterOrDigit || input(end) == '_'))) {
        pos = end; true
      } else false
    }
    private def ident(): String = {
      ws()
      val start = pos
      while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '_')) pos += 1
      require(pos > start, s"expected identifier at $pos in: $input")
      input.substring(start, pos)
    }

    def parse(): Ast = { val e = orExpr(); ws(); require(pos >= input.length, s"trailing input at $pos in: $input"); e }

    private def orExpr(): Ast = {
      var l = andExpr()
      while (tryKeyword("or")) l = Or(l, andExpr())
      l
    }
    private def andExpr(): Ast = {
      var l = notExpr()
      while (tryKeyword("and")) l = And(l, notExpr())
      l
    }
    private def notExpr(): Ast =
      if (tryKeyword("not")) Not(notExpr()) else cmpExpr()

    private def cmpExpr(): Ast = {
      val l = addExpr()
      ws()
      Seq("==", "!=", "<=", ">=", "<", ">").find(op => input.startsWith(op, pos)) match {
        case Some(op) => pos += op.length; Cmp(if (op == "==") "=" else op, l, addExpr())
        case None =>
          if (tryKeyword("in")) {
            eat('['); val items = scala.collection.mutable.Buffer[Ast]()
            ws()
            if (peek != ']') {
              items += primary()
              while (tryEat(",")) items += primary()
            }
            eat(']'); In(l, items.toSeq)
          } else l
      }
    }

    private def addExpr(): Ast = {
      var l = mulExpr()
      var go = true
      while (go) {
        ws()
        if (peek == '+') { pos += 1; l = Arith("+", l, mulExpr()) }
        else if (peek == '-') { pos += 1; l = Arith("-", l, mulExpr()) }
        else go = false
      }
      l
    }
    private def mulExpr(): Ast = {
      var l = postfix()
      var go = true
      while (go) {
        ws()
        if (peek == '*') { pos += 1; l = Arith("*", l, postfix()) }
        else if (peek == '/') { pos += 1; l = Arith("/", l, postfix()) }
        else if (peek == '%') { pos += 1; l = Arith("%", l, postfix()) }
        else go = false
      }
      l
    }
    /** primary with subscript suffixes: an integer literal subscript is
      * 0-based array indexing (`records[0]`); any other subscript expression
      * is a map lookup (`|{"jane": 1}|[in.value.name]` — ref demo/etl.zed:1-18
      * const-map lookups, inlined since YAML zed blocks carry no const
      * declarations). An in-list's `[` never reaches here: `in` is consumed
      * as a keyword one level up.
      */
    private def postfix(): Ast = {
      var e = primary()
      while ({ ws(); peek == '[' }) {
        pos += 1
        ws()
        val sub = orExpr()
        eat(']')
        e = sub match {
          case NumLit(v) if !v.contains('.') => Index(e, v.toInt)
          case k => Lookup(e, k)
        }
      }
      e
    }

    private def primary(): Ast = {
      ws()
      peek match {
        case '(' => eat('('); val e = orExpr(); eat(')'); e
        case '{' => record()
        case '|' => mapLit()
        case '"' => StrLit(quoted())
        case c if c.isDigit || c == '-' => number()
        case _ =>
          // sql:(...) escape hatch
          if (tryEat("sql:(")) {
            val start = pos; var depth = 1
            while (depth > 0) {
              require(pos < input.length, "unterminated sql:(")
              if (input(pos) == '(') depth += 1
              else if (input(pos) == ')') depth -= 1
              pos += 1
            }
            return RawSql(input.substring(start, pos - 1))
          }
          val id = ident()
          id match {
            case "null" => NullLit
            case "true" => BoolLit(true)
            case "false" => BoolLit(false)
            case "cast" =>
              // cast(null, typeof(path))
              eat('('); ws(); require(tryEat("null"), "only cast(null, typeof(...)) supported")
              eat(','); ws(); require(tryEat("typeof"), "only cast(null, typeof(...)) supported")
              eat('('); val p = path(); eat(')'); eat(')')
              CastNullTypeof(p)
            case first =>
              ws()
              if (peek == '.') {
                pos += 1
                val rest = pathRest()
                Path(first +: rest)
              } else Path(Seq(first))
          }
      }
    }

    private def path(): Path = {
      val first = ident()
      if (peek == '.') { pos += 1; Path(first +: pathRest()) } else Path(Seq(first))
    }
    private def pathRest(): Seq[String] = {
      val parts = scala.collection.mutable.Buffer(ident())
      while (peek == '.') { pos += 1; parts += ident() }
      parts.toSeq
    }

    private def quoted(): String = {
      eat('"'); val sb = new StringBuilder
      while (peek != '"') {
        require(pos < input.length, "unterminated string")
        if (peek == '\\') {
          pos += 1
          require(pos < input.length, "unterminated string")
          // Standard escapes (ZSON strings follow JSON string syntax);
          // anything unrecognized is an error rather than a silent rewrite.
          input(pos) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'u' =>
              require(pos + 4 < input.length, "truncated \\u escape")
              sb += Integer.parseInt(input.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => throw new IllegalArgumentException(s"unsupported escape \\$other")
          }
          pos += 1
        } else { sb += input(pos); pos += 1 }
      }
      pos += 1
      sb.toString
    }

    private def number(): Ast = {
      ws(); val start = pos
      if (peek == '-') pos += 1
      while (pos < input.length && (input(pos).isDigit || input(pos) == '.')) pos += 1
      NumLit(input.substring(start, pos))
    }

    /** ZSON map literal `|{ "key": value, ... }|` (ref demo/etl.zed:1-10).
      * Keys and values are arbitrary expressions; in practice keys are
      * string literals and values scalars, which is all the reference's
      * const maps contain.
      */
    private def mapLit(): Ast = {
      eat('|'); eat('{')
      val entries = scala.collection.mutable.Buffer[(Ast, Ast)]()
      ws()
      if (peek != '}') {
        entries += mapEntry()
        while (tryEat(",")) { ws(); if (peek != '}') entries += mapEntry() }
      }
      eat('}'); eat('|')
      MapLit(entries.toSeq)
    }
    private def mapEntry(): (Ast, Ast) = {
      val k = orExpr(); eat(':'); (k, orExpr())
    }

    private def record(): Ast = {
      eat('{')
      val fields = scala.collection.mutable.Buffer[(String, Ast)]()
      ws()
      if (peek != '}') {
        fields += field()
        while (tryEat(",")) { ws(); if (peek != '}') fields += field() }
      }
      eat('}')
      RecordLit(fields.toSeq)
    }
    private def field(): (String, Ast) = {
      val name = ident(); eat(':'); (name, orExpr())
    }
  }

  def parse(s: String): Ast = new Parser(s.trim).parse()

  /** Parse the YAML `zed` block: `| out := { ... }` (leading pipe and
    * `out :=` scaffolding per etl/build.go:163-216).
    */
  def parseOutAssign(zed: String): Ast = {
    val body = zed.trim.stripPrefix("|").trim
    require(body.startsWith("out"), s"zed block must assign 'out': $zed")
    val rhs = body.stripPrefix("out").trim.stripPrefix(":=").trim
    parse(rhs)
  }

  // ---------------------------------------------------------- to Column
  /** Resolve static type of a path against a schema (for typeof). */
  private def typeAt(schema: StructType, parts: Seq[String]): DataType =
    parts.foldLeft(schema: DataType) {
      case (st: StructType, p) => st(p).dataType
      case (other, p) =>
        throw new IllegalArgumentException(s"cannot descend into $other at '$p'")
    }

  /** Compile to a Column. `schema` is the input row schema (for typeof). */
  def toColumn(ast: Ast, schema: StructType): Column = ast match {
    case Path(parts) => col(parts.mkString("."))
    case StrLit(v) => lit(v)
    case NumLit(v) => if (v.contains('.')) lit(v.toDouble) else lit(v.toLong)
    case BoolLit(v) => lit(v)
    case NullLit => lit(null)
    case RecordLit(fields) =>
      struct(fields.map { case (n, e) => toColumn(e, schema).as(n) }: _*)
    case MapLit(entries) =>
      map(entries.flatMap { case (k, v) =>
        Seq(toColumn(k, schema), toColumn(v, schema)) }: _*)
    case Lookup(m, k) => element_at(toColumn(m, schema), toColumn(k, schema))
    case Cmp("=", l, r) => toColumn(l, schema) === toColumn(r, schema)
    case Cmp("!=", l, r) => toColumn(l, schema) =!= toColumn(r, schema)
    case Cmp("<", l, r) => toColumn(l, schema) < toColumn(r, schema)
    case Cmp("<=", l, r) => toColumn(l, schema) <= toColumn(r, schema)
    case Cmp(">", l, r) => toColumn(l, schema) > toColumn(r, schema)
    case Cmp(">=", l, r) => toColumn(l, schema) >= toColumn(r, schema)
    case Cmp(op, _, _) => throw new IllegalArgumentException(s"bad op $op")
    case Arith("+", l, r) => toColumn(l, schema) + toColumn(r, schema)
    case Arith("-", l, r) => toColumn(l, schema) - toColumn(r, schema)
    case Arith("*", l, r) => toColumn(l, schema) * toColumn(r, schema)
    case Arith("/", l, r) => toColumn(l, schema) / toColumn(r, schema)
    case Arith("%", l, r) => toColumn(l, schema) % toColumn(r, schema)
    case Arith(op, _, _) => throw new IllegalArgumentException(s"bad op $op")
    case Index(e, i) => toColumn(e, schema).getItem(i)
    case In(e, list) => toColumn(e, schema).isin(list.map[Any] {
      case StrLit(v) => v
      case NumLit(v) => if (v.contains('.')) v.toDouble else v.toLong
      case other => throw new IllegalArgumentException(s"bad in-list item: $other")
    }: _*)
    case And(l, r) => toColumn(l, schema) && toColumn(r, schema)
    case Or(l, r) => toColumn(l, schema) || toColumn(r, schema)
    case Not(e) => !toColumn(e, schema)
    case CastNullTypeof(p) => lit(null).cast(typeAt(schema, p.parts))
    case RawSql(sql) => expr(sql)
  }

  /** Predicate string → Column (empty string = always true). */
  def predicate(where: String, schema: StructType): Column =
    if (where.trim.isEmpty) lit(true) else toColumn(parse(where), schema)
}
