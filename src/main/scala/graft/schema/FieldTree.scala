package graft.schema

import org.apache.spark.sql.types._

/** Immutable demand trie overlaid on a relation's full schema.
  *
  * Each node records whether the *full subtree* rooted at that field is
  * demanded (`required`) and which child fields are touched. Keys are
  * name-normalized by the caller (lower-cased unless the session is
  * case-sensitive). Traversal through array / map layers is transparent:
  * a path segment always names a struct field, whether that struct sits
  * directly, inside an array, or inside a map value.
  *
  * Replaces the reference's mutable `SchemaElement` trie
  * (score SchemaElementImpl.java:13-120) with functional updates; demand
  * tiers per SURVEY.md §2.4.
  */
final case class FieldTree(
    required: Boolean,
    children: Map[String, FieldTree]) {

  /** Mark `path` as touched; when `full`, demand the whole subtree at its
    * end. Intermediate nodes are touched but not required (matching the
    * reference: nodes for all-but-last segment, SchemaOnReadState.java:161-185).
    */
  def mark(path: Seq[String], full: Boolean): FieldTree = path match {
    case Seq() => if (full && !required) copy(required = true) else this
    case head +: rest =>
      val child = children.getOrElse(head, FieldTree.empty)
      copy(children = children.updated(head, child.mark(rest, full)))
  }

  def isEmpty: Boolean = !required && children.isEmpty
}

object FieldTree {
  val empty: FieldTree = FieldTree(required = false, Map.empty)

  /** Sentinel path segment for demand on a map's KEY side: keys are always
    * materialized whole, so this counts as demand on the map without
    * forcing its value subtree (used by exploded-map key outputs). */
  val MapKeys: String = "keys"

  private def isComplex(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => true
    case _                                         => false
  }

  /** Skeleton: keep the column present with minimal IO — empty struct,
    * array-of-skeleton, map-of-skeleton; primitives pass through
    * (reference SchemaElementImpl.skeletonType:64-77).
    */
  def skeleton(dt: DataType): DataType = dt match {
    case _: StructType      => StructType(Nil)
    case ArrayType(e, n)    => ArrayType(skeleton(e), n)
    case MapType(k, v, n)   => MapType(k, skeleton(v), n) // keys stay whole
    case other              => other
  }

  /** Materialize a demand trie against a full schema (reference
    * SchemaOnReadExtractor.subSchema:85-136 + SchemaElementImpl.setPartialSchema):
    * untouched fields drop; required or primitive touched fields keep their
    * full type; partially-demanded complex fields recurse; touched-but-
    * undemanded complex fields become skeletons. Field order, nullability
    * and metadata are preserved.
    */
  def prune(full: StructType, tree: FieldTree, normalize: String => String): StructType = {
    // A type containing no structs (array/map of primitives): its skeleton
    // IS its full type, and an access into it yields a primitive — the
    // reference records such accesses as required leaves (result-DataType
    // leaf rule, SchemaOnReadState.java:161-185).
    def structFree(dt: DataType): Boolean = dt match {
      case _: StructType    => false
      case ArrayType(e, _)  => structFree(e)
      case MapType(k, v, _) => structFree(k) && structFree(v)
      case _                => true
    }
    // Does the demand trie reach any required-or-primitive struct field
    // within this type? (Touched primitives count as demand — the
    // reference's setFullSchema rule, SchemaElementImpl.java:46-51.)
    def anyDemand(dt: DataType, t: FieldTree): Boolean = dt match {
      case s: StructType =>
        s.fields.exists(f => t.children.get(normalize(f.name)).exists(ct =>
          ct.required || !isComplex(f.dataType) || structFree(f.dataType) ||
            anyDemand(f.dataType, ct)))
      case ArrayType(e, _)  => anyDemand(e, t)
      case MapType(_, v, _) => t.children.contains(MapKeys) || anyDemand(v, t)
      case _                => false
    }
    def pruneType(dt: DataType, t: FieldTree): DataType = dt match {
      case s: StructType    => pruneStruct(s, t)
      case ArrayType(e, n)  => ArrayType(pruneType(e, t), n)
      // Map KEYS are compared whole on every lookup — never prune them;
      // demand paths through a map address only its value side.
      case MapType(k, v, n) => MapType(k, pruneType(v, t), n)
      case other            => other
    }
    def pruneStruct(s: StructType, t: FieldTree): StructType =
      StructType(s.fields.flatMap { f =>
        t.children.get(normalize(f.name)).map { ft =>
          val newType =
            if (ft.required || !isComplex(f.dataType) || structFree(f.dataType)) f.dataType
            else if (anyDemand(f.dataType, ft)) pruneType(f.dataType, ft)
            else skeleton(f.dataType)
          f.copy(dataType = newType)
        }
      })
    pruneStruct(full, tree)
  }
}
