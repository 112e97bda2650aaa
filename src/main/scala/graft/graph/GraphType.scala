package graft.graph

/** ISO GQL graph types (reference: schema/types.rs GraphTypeDefinition,
  * schema/catalog/graph_type.rs, schema/validator.rs): a named schema of
  * node labels (typed properties, NOT NULL requirements) and edge types
  * (endpoint label sets). The Spark-native enforcement point is INSERT
  * statements against a session whose graph has a bound type — the
  * validator checks labels, required properties, property types, and
  * rejects unknown properties (the reference's strict default,
  * validator.rs:62 `allow_unknown_properties: false`).
  */
object GraphType {

  case class PropDef(name: String, dataType: String, required: Boolean)
  case class NodeTypeDef(label: String, props: Seq[PropDef])
  case class EdgeTypeDef(name: String, from: String, to: String,
      props: Seq[PropDef])
  case class GraphTypeDef(name: String, nodes: Seq[NodeTypeDef],
      edges: Seq[EdgeTypeDef])

  /** Literal type tags used at validation time. */
  sealed trait Lit
  case object LInt extends Lit
  case object LFloat extends Lit
  case object LString extends Lit
  case object LBool extends Lit
  case object LTemporal extends Lit
  case object LNull extends Lit

  private def accepts(declared: String, v: Lit): Boolean = {
    // strip a (p[,s]) / [d] parameter suffix: DECIMAL(12,2) → DECIMAL,
    // STRING(64) → STRING (reference TypeSpec, ast.rs:814-878)
    val base = declared.toUpperCase.takeWhile(c => c != '(' && c != '[')
    (base, v) match {
      case (_, LNull) => true // nullability checked separately via required
      case ("STRING" | "VARCHAR" | "TEXT", LString) => true
      case ("INT" | "INTEGER" | "BIGINT" | "SMALLINT", LInt) => true
      case ("DOUBLE" | "FLOAT" | "REAL" | "FLOAT64" | "FLOAT32", LInt | LFloat) => true
      // exact numerics accept both int and float literals; scale/precision
      // conformance is enforced at CAST time (ast.rs:826-830)
      case ("DECIMAL" | "NUMERIC", LInt | LFloat) => true
      // wide integers (ast.rs:814-878): GQL literals are 64-bit, so any
      // literal that parses conforms; storage is DECIMAL(38,0)
      case ("INT128" | "INT256", LInt) => true
      // bytes/duration literals arrive as strings on this surface
      // (hex/base64 for BYTES, ISO-8601 for DURATION)
      case ("BYTES" | "BINARY", LString) => true
      case ("DURATION", LString) => true
      case ("BOOLEAN" | "BOOL", LBool) => true
      case ("TIMESTAMP" | "DATETIME" | "DATE" | "TIME", LTemporal) => true
      case _ => false
    }
  }

  /** Spark storage type for a declared property type (used when an INSERT
    * provides only nulls for a column, so no value exists to infer from).
    */
  def sparkTypeOf(declared: String): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    val up = declared.toUpperCase
    val base = up.takeWhile(c => c != '(' && c != '[')
    base match {
      case "STRING" | "VARCHAR" | "TEXT" => Some(StringType)
      case "INT" | "INTEGER" | "BIGINT" | "SMALLINT" => Some(LongType)
      case "DOUBLE" | "FLOAT" | "REAL" | "FLOAT64" | "FLOAT32" => Some(DoubleType)
      case "DECIMAL" | "NUMERIC" =>
        val ps = "\\((\\d+)\\s*,\\s*(\\d+)\\)".r.findFirstMatchIn(up)
        Some(ps.map(m => DecimalType(m.group(1).toInt, m.group(2).toInt))
          .getOrElse(DecimalType(38, 18)))
      case "BOOLEAN" | "BOOL" => Some(BooleanType)
      case "TIMESTAMP" | "DATETIME" => Some(TimestampType)
      case "DATE" => Some(DateType)
      // INT128/INT256 store as DECIMAL(38,0): every value expressible on
      // this surface (64-bit literals) fits exactly; CAST to INT128/256
      // errors honestly (Compiler.sparkType)
      case "INT128" | "INT256" => Some(DecimalType(38, 0))
      // bytes/duration values are carried as their literal string forms
      // until binary/interval literal syntax exists on the GQL surface
      case "BYTES" | "BINARY" | "DURATION" => Some(StringType)
      case _ => None
    }
  }

  class GraphTypeViolation(msg: String) extends RuntimeException(msg)

  /** Validate an INSERT node against the type (validator.rs:92-126). */
  def validateNode(gt: GraphTypeDef, label: String,
      props: Seq[(String, Lit)]): Unit = {
    val nt = gt.nodes.find(_.label == label).getOrElse(
      throw new GraphTypeViolation(
        s"graph type ${gt.name}: unknown node label $label"))
    val given = props.toMap
    nt.props.filter(_.required).foreach { pd =>
      if (!given.contains(pd.name) || given(pd.name) == LNull)
        throw new GraphTypeViolation(
          s"graph type ${gt.name}: $label.${pd.name} is NOT NULL but missing")
    }
    props.foreach { case (name, v) =>
      nt.props.find(_.name == name) match {
        case None => throw new GraphTypeViolation(
          s"graph type ${gt.name}: unknown property $label.$name")
        case Some(pd) if !accepts(pd.dataType, v) =>
          throw new GraphTypeViolation(
            s"graph type ${gt.name}: $label.$name expects ${pd.dataType}")
        case _ => ()
      }
    }
  }

  /** Validate an INSERT edge (validator.rs:167-210): type exists, the
    * endpoint labels are permitted, properties conform. An endpoint whose
    * label is statically unknown (label-less or multi-label MATCH var)
    * passes as None — the id space it matched in is already constrained
    * by the pattern compiler's orientation guard, so only known labels
    * are checked here.
    */
  def validateEdge(gt: GraphTypeDef, typeName: String,
      fromLabel: Option[String], toLabel: Option[String],
      props: Seq[(String, Lit)]): Unit = {
    val et = gt.edges.find(_.name == typeName).getOrElse(
      throw new GraphTypeViolation(
        s"graph type ${gt.name}: unknown edge type $typeName"))
    if (fromLabel.exists(_ != et.from) || toLabel.exists(_ != et.to))
      throw new GraphTypeViolation(
        s"graph type ${gt.name}: $typeName connects ${et.from}->${et.to}, " +
          s"not ${fromLabel.getOrElse("?")}->${toLabel.getOrElse("?")}")
    props.foreach { case (name, v) =>
      et.props.find(_.name == name) match {
        case None => throw new GraphTypeViolation(
          s"graph type ${gt.name}: unknown property $typeName.$name")
        case Some(pd) if !accepts(pd.dataType, v) =>
          throw new GraphTypeViolation(
            s"graph type ${gt.name}: $typeName.$name expects ${pd.dataType}")
        case _ => ()
      }
    }
  }

  // ---- TSV serialization (catalog persistence) ----

  def serialize(gt: GraphTypeDef): String = {
    def ps(props: Seq[PropDef]) =
      props.map(p => s"${p.name}:${p.dataType}:${p.required}").mkString(",")
    (gt.nodes.map(n => s"NODE\t${n.label}\t${ps(n.props)}") ++
      gt.edges.map(e => s"EDGE\t${e.name}\t${e.from}\t${e.to}\t${ps(e.props)}"))
      .mkString("\n")
  }

  /** Split on top-level commas only — `DECIMAL(12,2)` type parameters
    * contain commas that must not split the property list.
    */
  private def splitTop(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case ',' if depth == 0 => out += sb.result(); sb.clear()
      case c =>
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        sb += c
    }
    if (sb.nonEmpty) out += sb.result()
    out.result()
  }

  def deserialize(name: String, text: String): GraphTypeDef = {
    def pp(s: String): Seq[PropDef] =
      splitTop(s).filter(_.nonEmpty).map { t =>
        val a = t.split(":")
        PropDef(a(0), a(1), a(2).toBoolean)
      }
    val lines = text.split("\n").filter(_.nonEmpty).toSeq
    val nodes = lines.filter(_.startsWith("NODE\t")).map { l =>
      val a = l.split("\t", 3)
      NodeTypeDef(a(1), if (a.length > 2) pp(a(2)) else Seq.empty)
    }
    val edges = lines.filter(_.startsWith("EDGE\t")).map { l =>
      val a = l.split("\t", 5)
      EdgeTypeDef(a(1), a(2), a(3), if (a.length > 4) pp(a(4)) else Seq.empty)
    }
    GraphTypeDef(name, nodes, edges)
  }
}
