package graft.api

/** Identifier with the reference's per-identifier case semantics
  * (spear-core/src/main/scala/spear/Name.scala:14-23 and
  * parsers/IdentifierParser.scala:49-62, SQL06 §5.2): a regular
  * (unquoted) identifier compares case-insensitively; a delimited
  * (`"quoted"`) identifier compares exactly. Equality between a sensitive
  * and an insensitive name is exact if EITHER side is sensitive —
  * matching the reference's `equals`. Hashing is case-normalized so the
  * two kinds can share hash-keyed collections, exactly as the reference
  * hashes `casePreserving.toUpperCase`.
  *
  * A name may also carry a `namespace` (reference Name.scala:3-10,
  * `withNamespace`): two names are equal only when their namespaces match
  * exactly (namespaces never case-fold), and a namespaced name prints as
  * `name@namespace`. The hash stays namespace-free, like the reference's.
  *
  * Spark itself has only the global `spark.sql.caseSensitive` switch, so
  * this shim lives in the facade: [[DataFrame.col]] resolves identifiers
  * through it, restoring the reference's quoted-vs-unquoted distinction
  * on top of a Spark schema.
  */
final class Name private (
    val casePreserving: String,
    val isCaseSensitive: Boolean,
    val namespace: String)
    extends Serializable {

  def withNamespace(namespace: String): Name =
    new Name(casePreserving, isCaseSensitive, namespace)

  // the hash must be constant across everything `equals` can call equal:
  // equalsIgnoreCase compares per-char (toUpper match OR toLower match),
  // so fold each char through the same two-step map — string-level
  // toUpperCase(ROOT) diverged on U+0130 ("i".equalsIgnoreCase("İ") is
  // true, but "İ".toUpperCase(ROOT) stays İ while "i" uppercases to I).
  // namespace is excluded, mirroring the reference's namespace-free hash.
  override def hashCode(): Int = {
    var h = 0
    var i = 0
    while (i < casePreserving.length) {
      h = 31 * h +
        Character.toLowerCase(Character.toUpperCase(casePreserving.charAt(i)))
      i += 1
    }
    h
  }

  override def equals(other: Any): Boolean = other match {
    case that: Name if this.isCaseSensitive || that.isCaseSensitive =>
      this.namespace == that.namespace &&
        this.casePreserving == that.casePreserving
    case that: Name =>
      this.namespace == that.namespace &&
        this.casePreserving.equalsIgnoreCase(that.casePreserving)
    case _ => false
  }

  /** Reference `toString` (Name.scala:10): quoted form re-delimits with
    * `""` escaping; regular form prints as-is; a namespace appends
    * `@namespace`. */
  override def toString: String = {
    val base =
      if (isCaseSensitive) "\"" + casePreserving.replace("\"", "\"\"") + "\""
      else casePreserving
    if (namespace.isEmpty) base else s"$base@$namespace"
  }
}

object Name {
  def apply(name: String, isCaseSensitive: Boolean): Name =
    new Name(name, isCaseSensitive, "")

  def caseSensitive(name: String): Name = apply(name, isCaseSensitive = true)
  def caseInsensitive(name: String): Name = apply(name, isCaseSensitive = false)

  /** Surface syntax: `"quoted"` → case-sensitive (with `""` unescaping,
    * IdentifierParser.scala:53-55); anything else → regular
    * (case-insensitive). */
  def parse(s: String): Name =
    if (s.length >= 2 && s.head == '"' && s.last == '"')
      caseSensitive(s.substring(1, s.length - 1).replace("\"\"", "\""))
    else caseInsensitive(s)
}
