package graft.schema

import java.util.Locale

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.catalog.{CatalogTable, HiveTableRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, FileTable}
import org.apache.spark.sql.types.StructType

/** A file-based relation's identity: its sorted, filesystem-qualified input
  * file paths. Wildcard reads, unordered/duplicated path lists and
  * partitioned directories all normalize to the same key (reference:
  * SchemaOnReadState.java:80-95,122-126 — which keyed by `List.hashCode`;
  * we keep the paths themselves and avoid the silent-collision risk).
  */
final case class RelationKey(paths: Vector[String])

/** Result of analyzing one query plan: the minimal read schema per source
  * relation, plus lookups by path set and by registered view alias.
  * API parity with the reference's SchemaOnReadGenerator.java:30-85.
  */
/** Qualifies raw paths into a [[RelationKey]] (filesystem-resolved,
  * sorted). Standalone so results don't retain analysis state. */
private[schema] final class PathQualifier(conf: org.apache.hadoop.conf.Configuration) {
  def apply(paths: Seq[String]): RelationKey =
    RelationKey(paths.map { s =>
      val p = new Path(s)
      val fs = p.getFileSystem(conf)
      p.makeQualified(fs.getUri, fs.getWorkingDirectory).toString
    }.sorted.toVector)
}

final class SchemaOnReadResult private[schema] (
    val schemas: Map[RelationKey, StructType],
    val fullSchemas: Map[RelationKey, StructType],
    val viewRelations: Map[String, RelationKey],
    val tableRelations: Map[String, RelationKey],
    private[schema] val qualify: PathQualifier,
    val durationNanos: Long) {

  /** Pruned schema for the relation reading exactly these paths (any order,
    * duplicates ignored; must be the relation's expanded input files — or,
    * for a streaming relation, the source directory paths as given to
    * `readStream`). */
  def schemaFor(paths: String*): Option[StructType] =
    scala.util.Try(qualify(paths.distinct)).toOption.flatMap(schemas.get)

  /** Pruned schema for a relation registered under a temp-view alias.
    * Falls back to table bindings so either lookup resolves a name used
    * only one way; when a temp view SHADOWS a catalog table name, each
    * accessor prefers its own namespace (the two maps are kept separate
    * precisely so one binding cannot overwrite the other). */
  def schemaForView(name: String): Option[StructType] =
    viewRelations.get(name).orElse(tableRelations.get(name)).flatMap(schemas.get)

  /** Pruned schema for a catalog table read via `spark.table(...)` /
    * `SELECT ... FROM db.t` — registered under both its bare table name
    * and its qualified `db.table` name. Consults table bindings first. */
  def schemaForTable(name: String): Option[StructType] =
    tableRelations.get(name).orElse(viewRelations.get(name)).flatMap(schemas.get)

  def relationKeys: Set[RelationKey] = schemas.keySet

  def durationMillis: Long = durationNanos / 1000000L
}

/** Computes, for an arbitrary analyzed Spark query over nested data, the
  * minimal nested read schema each file-based source actually needs — the
  * reference library's whole capability (see SURVEY.md), rebuilt on
  * structural Catalyst traversal with exprId lineage instead of the
  * reference's `Expression.sql()` regex parsing (SQLExpressionParser.java).
  *
  * Demand tiers (SURVEY.md §2.4, proven against the reference tests):
  *  - grouping / sort-order / join-condition / window-spec expressions
  *    demand the full subtree of any complex value they reference (those
  *    contexts compare or hash the entire value);
  *  - project / aggregate / window-function / generator expressions demand
  *    the full subtree only at the query's upper-most selection nodes;
  *    below those, only the traversed path is touched;
  *  - touched primitives are always kept; touched-but-undemanded complex
  *    columns materialize as skeletons (empty struct etc.);
  *  - a relation none of whose columns were touched falls back to its full
  *    schema, and the whole analysis is fail-open: any error yields full
  *    schemas for every discovered relation.
  */
object SchemaOnRead {

  def generate(df: Dataset[Row]): SchemaOnReadResult =
    generate(df.queryExecution.analyzed, df.sparkSession)

  def generate(plan: LogicalPlan, spark: SparkSession): SchemaOnReadResult = {
    val t0 = System.nanoTime()
    val analysis = new Analysis(spark)
    try {
      analysis.analyzeRoot(plan)
      analysis.result(System.nanoTime() - t0)
    } catch {
      case NonFatal(_) => analysis.failOpenResult(plan, System.nanoTime() - t0)
    }
  }

  /** One column path into one relation's schema. Segments are normalized
    * struct-field names; array/map layers are traversed transparently. */
  private final case class ColPath(rel: RelationKey, segments: Vector[String]) {
    def child(name: String): ColPath = copy(segments = segments :+ name)
  }

  /** Lineage of an expression: `direct` = column paths it IS (attribute /
    * extract-value chains — extendable with further field access);
    * `indirect` = paths referenced while computing a derived value (not
    * extendable, but must be fully demanded if the derived value is
    * compared/hashed/emitted whole). */
  private final case class Refs(direct: Set[ColPath], indirect: Set[ColPath]) {
    def all: Set[ColPath] = direct ++ indirect
  }
  private object Refs { val empty: Refs = Refs(Set.empty, Set.empty) }

  private type Lineage = Map[ExprId, Refs]

  private final class Analysis(spark: SparkSession) {
    private val caseSensitive = spark.sessionState.conf.caseSensitiveAnalysis
    private val norm: String => String =
      if (caseSensitive) identity else _.toLowerCase(Locale.ROOT)

    private val tries = mutable.LinkedHashMap.empty[RelationKey, FieldTree]
    private val fulls = mutable.LinkedHashMap.empty[RelationKey, StructType]
    private val views = mutable.LinkedHashMap.empty[String, RelationKey]
    // catalog-table name bindings — separate from temp-view bindings so a
    // view and a table sharing a bare name never overwrite each other
    private val tables = mutable.LinkedHashMap.empty[String, RelationKey]
    private val uppermost = mutable.Set.empty[LogicalPlan]
    private val cteLineage = mutable.Map.empty[Long, Seq[Refs]]
    private var lastRelation: Option[RelationKey] = None

    private val qualifier = new PathQualifier(spark.sessionState.newHadoopConf())

    def qualifyKey(paths: Seq[String]): RelationKey = qualifier(paths)

    // ---- demand recording --------------------------------------------

    private def mark(p: ColPath, full: Boolean): Unit =
      tries.updateWith(p.rel)(t => Some(t.getOrElse(FieldTree.empty).mark(p.segments, full)))

    /** Structural resolution of an expression to column paths — replaces
      * the reference's SQL-string parser (SQLExpressionParser.java:11-49). */
    private def resolve(e: Expression, lin: Lineage): Refs = e match {
      case a: AttributeReference => lin.getOrElse(a.exprId, Refs.empty)
      case g: GetStructField =>
        val r = resolve(g.child, lin)
        val name = g.child.dataType match {
          case s: StructType => s(g.ordinal).name
          case _             => g.name.getOrElse("")
        }
        if (r.direct.nonEmpty) Refs(r.direct.map(_.child(norm(name))), r.indirect)
        else Refs(Set.empty, r.all)
      case g: GetArrayStructFields =>
        val r = resolve(g.child, lin)
        if (r.direct.nonEmpty) Refs(r.direct.map(_.child(norm(g.field.name))), r.indirect)
        else Refs(Set.empty, r.all)
      case g: GetArrayItem =>
        val r = resolve(g.left, lin)
        Refs(r.direct, r.indirect ++ resolve(g.right, lin).all)
      case g: GetMapValue =>
        val r = resolve(g.child, lin)
        Refs(r.direct, r.indirect ++ resolve(g.key, lin).all)
      case a: Alias => resolve(a.child, lin)
      // first/last return one of their input VALUES untouched (selection
      // depends on row order, not content) — downstream field access
      // through them narrows the source, like the reference's alias-trie
      // sharing for first() (SchemaOnReadGeneratorTest.java:1657-1677).
      // max/min deliberately do NOT pass through: they compare the whole
      // value, so narrowing would change their result.
      case ae: aggregate.AggregateExpression => resolve(ae.aggregateFunction, lin)
      case f: aggregate.First => resolve(f.child, lin)
      case l: aggregate.Last => resolve(l.child, lin)
      case _: SubqueryExpression => Refs.empty // recorded separately
      case other =>
        Refs(Set.empty, other.children.foldLeft(Set.empty[ColPath])(_ ++ resolve(_, lin).all))
    }

    private def isComplexType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: StructType | _: org.apache.spark.sql.types.ArrayType |
          _: org.apache.spark.sql.types.MapType => true
      case _ => false
    }

    /** Record column demand for every path referenced under `e`.
      * `full` = demand the whole subtree (mandatory / upper-most
      * conditional contexts); otherwise just touch the path (leaf-level).
      *
      * `nested` = the expression sits inside a computing parent (a
      * comparison, function call, …) rather than being a bare projection:
      * a complex-typed column consumed there is read WHOLE (e.g.
      * `WHERE s1 = s2`, `to_json(s)`), so its full subtree is demanded —
      * skeletonizing it would silently change results. Value-passthrough
      * wrappers (Alias, first/last, generators) keep `nested` unchanged.
      */
    private def record(e: Expression, full: Boolean, lin: Lineage,
        nested: Boolean = false): Unit = e match {
      case s: SubqueryExpression =>
        analyzeRoot(s.plan)
        s.children.foreach(record(_, full = false, lin, nested = true))
      case a: Alias => record(a.child, full, lin, nested)
      case ae: aggregate.AggregateExpression =>
        record(ae.aggregateFunction, full, lin, nested)
        ae.filter.foreach(record(_, full = false, lin, nested = true))
      case f: aggregate.First => record(f.child, full, lin, nested)
      case l: aggregate.Last => record(l.child, full, lin, nested)
      case _: AttributeReference | _: GetStructField | _: GetArrayStructFields |
          _: GetArrayItem | _: GetMapValue =>
        val r = resolve(e, lin)
        val f = full || (nested && isComplexType(e.dataType))
        r.direct.foreach(mark(_, f))
        r.indirect.foreach(mark(_, f))
      case other => other.children.foreach(record(_, full, lin, nested = true))
    }

    // ---- plan walk ----------------------------------------------------

    private def isSelection(p: LogicalPlan): Boolean = p match {
      case _: Project | _: Aggregate | _: Window | _: Generate | _: Sort | _: Join => true
      case _ => false
    }

    /** Top-down: the first selection node on each root-to-leaf path is
      * "upper-most" — its conditional output is the query's final shape
      * (reference SchemaOnReadGenerator.java:44-45,66-73). */
    private def markUppermost(p: LogicalPlan): Unit = p match {
      case w: WithCTE => markUppermost(w.plan) // CTE defs are consumed via refs — never upper-most themselves
      case _ if isSelection(p) => uppermost += p
      case _ => p.children.foreach(markUppermost)
    }

    /** Analyze a root plan (query root or subquery-expression root): mark
      * its upper-most nodes, walk it, and demand its final output in full —
      * the query's result columns must all be readable. */
    def analyzeRoot(plan: LogicalPlan): Unit = {
      markUppermost(plan)
      val lin = walk(plan)
      plan.output.foreach(record(_, full = true, lin))
    }

    /** A catalog-backed relation is additionally addressable by name:
      * register its key under both the bare and qualified identifiers so
      * [[SchemaOnReadResult.schemaForTable]] resolves either spelling. */
    private def registerTable(ct: CatalogTable, key: RelationKey): Unit = {
      tables.update(ct.identifier.table, key)
      ct.identifier.database.foreach(db =>
        tables.update(s"$db.${ct.identifier.table}", key))
      tables.update(ct.qualifiedName, key) // may add a catalog prefix
    }

    private def walk(plan: LogicalPlan): Lineage = plan match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            val key = qualifyKey(fs.location.inputFiles.toSeq)
            // a datasource catalog table (`spark.table(...)`) resolves to
            // this same node with catalogTable set — same path identity,
            // plus a name binding
            lr.catalogTable.foreach(registerTable(_, key))
            relationLineage(key, fs.schema, lr.output)
          case _ => opaque(lr.output)
        }

      // Hive-format catalog tables expose no file listing at analysis
      // time — key them by catalog identity instead (stable across reads
      // of the same table, as sorted paths are for file relations). The
      // reference matched only LogicalRelation and fell to the opaque
      // catch-all here (TreeNodeProcessingRegistry.java:25-30).
      case h: HiveTableRelation =>
        val key = RelationKey(Vector("catalog:" + h.tableMeta.qualifiedName))
        registerTable(h.tableMeta, key)
        relationLineage(key, h.tableMeta.schema, h.output)

      case d: DataSourceV2Relation =>
        d.table match {
          case ft: FileTable =>
            val key = qualifyKey(ft.fileIndex.inputFiles.toSeq)
            // V2 identifiers come from catalog resolution — table namespace
            d.identifier.foreach { id =>
              tables.update(id.name, key)
              tables.update((id.namespace :+ id.name).mkString("."), key)
            }
            relationLineage(key, ft.schema, d.output)
          case _ => opaque(d.output)
        }

      // Streaming file sources: no finite file listing exists (the
      // directory grows), so the relation's identity is its user-supplied
      // path set, filesystem-qualified like batch file lists. The pruned
      // schema is applied by the USER via `readStream.schema(pruned)` —
      // the narrowing then rides the source itself into every microbatch,
      // independent of per-batch optimizer pruning.
      case sr: org.apache.spark.sql.execution.streaming.runtime.StreamingRelation =>
        // DataStreamReader passes the directory via options("path"), not
        // the DataSource paths list
        val opts = org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(sr.dataSource.options)
        val paths = sr.dataSource.paths ++ opts.get("path")
        if (paths.isEmpty) opaque(sr.output)
        else relationLineage(qualifyKey(paths),
          StructType(sr.output.map(a =>
            org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable, a.metadata))),
          sr.output)

      case sr: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2 =>
        sr.table match {
          case ft: FileTable =>
            // root paths, not the (growing) expanded file list — the
            // stream's identity is its directory set
            relationLineage(qualifyKey(ft.fileIndex.rootPaths.map(_.toString)),
              ft.schema, sr.output)
          case _ => opaque(sr.output) // rate/memory/kafka: nothing to prune
        }

      case _: LocalRelation | _: OneRowRelation =>
        lastRelation = None // a local side of a join must not capture columns
        Map.empty

      // A plan captured POST-cache-materialization (e.g. via
      // `queryExecution.withCachedData`) presents the cache as a leaf
      // holding only a physical plan — there is no file read behind it to
      // prune, so it is deliberately opaque. Resetting the cursor keeps an
      // alias over the cached subtree from binding a stale relation. The
      // normal entry point (`generate(df)`) analyzes the ANALYZED plan,
      // where cache substitution has not happened yet and sources resolve.
      case _: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        lastRelation = None
        Map.empty

      case s: SubqueryAlias =>
        val lin = walk(s.child)
        val rels = s.child.output.flatMap(a => lin.get(a.exprId)).flatMap(_.direct.map(_.rel)).distinct
        val bound = rels match {
          case Seq(one) => Some(one)
          case Seq() =>
            // no direct column lineage (e.g. alias over a derived-only
            // aggregate): fall back to the walk cursor only when the
            // subtree holds a single relation node — an alias over a
            // multi-source join has no well-defined relation
            val relationNodes = s.child.collect {
              case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] => lr
              case d: DataSourceV2Relation if d.table.isInstanceOf[FileTable] => d
            }
            if (relationNodes.length == 1) lastRelation else None
          case _ => None
        }
        // a qualified alias (e.g. spark_catalog.default.t wrapping a
        // catalog-table read) is a TABLE spelling — binding it into the
        // view namespace would let it overwrite a temp view sharing the
        // bare name (walk order would win)
        val target = if (s.identifier.qualifier.nonEmpty) tables else views
        bound.foreach(target.update(s.identifier.name, _))
        lin

      case p: Project =>
        val cl = walk(p.child)
        val full = uppermost(p)
        cl ++ p.projectList.map { ne =>
          record(ne, full, cl)
          ne.exprId -> resolve(ne, cl)
        }

      case a: Aggregate =>
        val cl = walk(a.child)
        a.groupingExpressions.foreach(record(_, full = true, cl))
        val full = uppermost(a)
        cl ++ a.aggregateExpressions.map { ne =>
          record(ne, full, cl)
          ne.exprId -> resolve(ne, cl)
        }

      case w: Window =>
        val cl = walk(w.child)
        (w.partitionSpec ++ w.orderSpec).foreach(record(_, full = true, cl))
        val full = uppermost(w)
        cl ++ w.windowExpressions.map { ne =>
          record(ne, full, cl)
          ne.exprId -> resolve(ne, cl)
        }

      case s: Sort =>
        val cl = walk(s.child)
        s.order.foreach(record(_, full = true, cl))
        cl

      case f: Filter =>
        val cl = walk(f.child)
        record(f.condition, full = false, cl)
        cl

      case j: Join =>
        val cl = walk(j.left) ++ walk(j.right)
        j.condition.foreach(record(_, full = true, cl))
        cl

      case g: Generate =>
        val cl = walk(g.child)
        // generator inputs are traversed, not consumed whole — their
        // element demand comes from downstream lineage, so no complex
        // promotion here (nested = false)
        g.generator.children.foreach(record(_, full = uppermost(g), cl))
        cl ++ generatorLineage(g, cl)

      case u: Union =>
        val childLins = u.children.map(walk)
        childLins.reduce(_ ++ _) ++ u.output.zipWithIndex.map { case (a, i) =>
          val refs = u.children.zip(childLins).map { case (c, l) =>
            l.getOrElse(c.output(i).exprId, Refs.empty)
          }
          a.exprId -> Refs(refs.flatMap(_.direct).toSet, refs.flatMap(_.indirect).toSet)
        }

      case e: Expand =>
        val cl = walk(e.child)
        cl ++ e.output.zipWithIndex.map { case (a, i) =>
          val refs = e.projections.filter(_.length > i).map(p => resolve(p(i), cl))
          a.exprId -> Refs(refs.flatMap(_.direct).toSet, refs.flatMap(_.indirect).toSet)
        }

      case i: Intersect =>
        setOpLineage(i.left, i.right, i.output)
      case x: Except =>
        setOpLineage(x.left, x.right, x.output)

      case d: Distinct =>
        val cl = walk(d.child)
        d.child.output.foreach(record(_, full = true, cl)) // whole-row compare
        cl

      case d: Deduplicate =>
        val cl = walk(d.child)
        d.keys.foreach(record(_, full = true, cl))
        cl

      case r: RepartitionByExpression =>
        val cl = walk(r.child)
        r.partitionExpressions.foreach(record(_, full = true, cl)) // hashed whole
        cl

      case w: WithCTE =>
        w.cteDefs.foreach { d =>
          val lin = walk(d.child)
          cteLineage(d.id) = d.child.output.map(a => lin.getOrElse(a.exprId, Refs.empty))
        }
        walk(w.plan)

      case r: CTERelationRef =>
        val defLin = cteLineage.getOrElse(r.cteId, Seq.empty)
        r.output.zipWithIndex.collect {
          case (a, i) if i < defLin.length => a.exprId -> defLin(i)
        }.toMap

      case other =>
        // Limit/Offset/Sample/Repartition/hints/views/object operators/etc.
        // Lineage passes through; any expressions the node carries are
        // demanded in full — we don't know the node's semantics, so
        // fail-closed on its inputs (e.g. DeserializeToObject's
        // deserializer reads whole columns).
        val cl = other.children.map(walk).foldLeft(Map.empty: Lineage)(_ ++ _)
        other.expressions.foreach(record(_, full = true, cl))
        cl
    }

    private def relationLineage(
        key: RelationKey, schema: StructType, output: Seq[Attribute]): Lineage = {
      fulls.getOrElseUpdate(key, schema)
      tries.getOrElseUpdate(key, FieldTree.empty)
      lastRelation = Some(key)
      output.map(a => a.exprId -> Refs(Set(ColPath(key, Vector(norm(a.name)))), Set.empty)).toMap
    }

    private def opaque(output: Seq[Attribute]): Lineage = {
      lastRelation = None
      output.map(_.exprId -> Refs.empty).toMap
    }

    private def setOpLineage(
        left: LogicalPlan, right: LogicalPlan, output: Seq[Attribute]): Lineage = {
      val ll = walk(left)
      val rl = walk(right)
      left.output.foreach(record(_, full = true, ll)) // set ops compare whole rows
      right.output.foreach(record(_, full = true, rl))
      val cl = ll ++ rl
      cl ++ output.zipWithIndex.map { case (a, i) =>
        val l = ll.getOrElse(left.output(i).exprId, Refs.empty)
        val r = rl.getOrElse(right.output(i).exprId, Refs.empty)
        a.exprId -> Refs(l.direct ++ r.direct, l.indirect ++ r.indirect)
      }
    }

    /** Map generator outputs to the exploded collection's path so that
      * downstream `item.field` resolves into the element struct — the
      * lineage the reference hand-rolled via its "last generator output
      * name" alias hack (SchemaOnReadState.java:204-208,223-228). */
    private def generatorLineage(g: Generate, cl: Lineage): Lineage = {
      def collection(e: Expression): Refs = resolve(e, cl)
      g.generator match {
        case e: ExplodeBase =>
          val refs = collection(e.child)
          e.child.dataType match {
            case _: org.apache.spark.sql.types.MapType =>
              // outputs: [pos,] key, value — the key output demands only the
              // map's (always-whole) key side via the sentinel segment, the
              // value output resolves to the map for value-field narrowing
              val Seq(keyAttr, valueAttr) = g.generatorOutput.takeRight(2)
              Map(
                keyAttr.exprId -> Refs(refs.direct.map(_.child(FieldTree.MapKeys)), refs.indirect),
                valueAttr.exprId -> refs) ++
                g.generatorOutput.dropRight(2).map(_.exprId -> Refs.empty).toMap
            case _ =>
              // outputs: [pos,] col
              Map(g.generatorOutput.last.exprId -> refs) ++
                g.generatorOutput.dropRight(1).map(_.exprId -> Refs.empty).toMap
          }
        case inline: Inline =>
          val refs = collection(inline.child)
          inline.child.dataType match {
            case org.apache.spark.sql.types.ArrayType(s: StructType, _) =>
              g.generatorOutput.zip(s.fields).map { case (a, f) =>
                a.exprId -> Refs(refs.direct.map(_.child(norm(f.name))), refs.indirect)
              }.toMap
            case _ => opaqueGen(g)
          }
        case _ => opaqueGen(g)
      }
    }

    private def opaqueGen(g: Generate): Lineage =
      g.generatorOutput.map(_.exprId -> Refs.empty).toMap

    // ---- results ------------------------------------------------------

    def result(durationNanos: Long): SchemaOnReadResult = {
      val schemas = tries.map { case (key, tree) =>
        val full = fulls(key)
        val pruned =
          if (tree.isEmpty) full
          else {
            val p = FieldTree.prune(full, tree, norm)
            if (p.isEmpty) full else p // fallback (SchemaOnReadExtractor.java:154-158)
          }
        key -> pruned
      }.toMap
      new SchemaOnReadResult(schemas, fulls.toMap, views.toMap, tables.toMap,
        qualifier, durationNanos)
    }

    /** Fail-open: any analysis error yields full schemas for every
      * file-based relation found in the plan (reference README.md:9).
      * Relations whose own identity cannot be computed (the likely cause
      * of the original failure) are skipped rather than rethrown. */
    def failOpenResult(plan: LogicalPlan, durationNanos: Long): SchemaOnReadResult = {
      val found = plan.collect {
        case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val fs = lr.relation.asInstanceOf[HadoopFsRelation]
          scala.util.Try(qualifyKey(fs.location.inputFiles.toSeq) -> fs.schema).toOption
        case d: DataSourceV2Relation if d.table.isInstanceOf[FileTable] =>
          val ft = d.table.asInstanceOf[FileTable]
          scala.util.Try(qualifyKey(ft.fileIndex.inputFiles.toSeq) -> ft.schema).toOption
        case h: HiveTableRelation =>
          Some(RelationKey(Vector("catalog:" + h.tableMeta.qualifiedName)) ->
            h.tableMeta.schema)
      }.flatten.toMap
      new SchemaOnReadResult(found, found, views.toMap, tables.toMap,
        qualifier, durationNanos)
    }
  }
}
