package graft.registries

/** THE identifier charset for every persisted name in the engine — value
  * ids, aliases, context names, workflow and step names, profiled column
  * names: `[A-Za-z0-9_.-]+`.
  *
  * Several persisted encodings are exact ONLY under this rule: the
  * archive manifest's regex scan (Archive.readManifest), the workflow
  * store's ':'-delimited step records, and the flat properties files of
  * AliasRegistry/GraftContexts. If the charset ever needs to grow, widen
  * it HERE and fix those readers in the same change — a per-site edit
  * silently corrupts the others.
  */
object Names {
  /** The allowed charset, as a full-match regex (no anchors needed for
    * String.matches) and embeddable in larger regexes. */
  val Pattern = "[A-Za-z0-9_.-]+"

  def isValid(s: String): Boolean =
    s.matches(Pattern) && s != "." && s != ".."

  /** Validate-and-return; `kind` names the identifier in the error. */
  def validate(kind: String, s: String): String = {
    require(isValid(s), s"bad $kind: $s (allowed: $Pattern, not '.' or '..')")
    s
  }
}
