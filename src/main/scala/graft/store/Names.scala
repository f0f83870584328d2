package graft.store

/** Identifier hygiene, mirroring the reference's name rules
  * (/root/reference/pandabase/helpers.py:185 clean_name).
  */
object Names {

  /** PK column name used when the caller asks for a synthetic index
    * (reference: helpers.py:13 PANDABASE_DEFAULT_INDEX). */
  val AutoIndex = "pandabase_auto_generated_index"

  private val replaceWithUnderscore = " ()+-/*\";=&|#><^%{}".toSet
  private val dropChars = Set('.', ',')

  /** Standardize a name: lower-case, special chars → '_', drop '.'/','.
    * Rejects names that start with a digit or contain '@'
    * (reference: helpers.py:185-196).
    */
  def cleanName(name: String): String = {
    require(name != null && name.nonEmpty, "empty identifier")
    if (name(0).isDigit)
      throw new IllegalNameException(
        s"names may not start with digits: $name")
    if (name.contains('@'))
      throw new IllegalNameException(s"'@' is not a legal identifier char: $name")
    name.toLowerCase.trim.flatMap {
      case c if replaceWithUnderscore(c) => "_"
      case c if dropChars(c)             => ""
      case c                             => c.toString
    }
  }
}

/** Mirrors the reference's NameError conditions. */
class IllegalNameException(msg: String) extends RuntimeException(msg)

/** Mirrors reference ValueError/IOError conditions on writes. */
class StoreException(msg: String) extends RuntimeException(msg)

/** An optimistic commit ([[KeyedTable.appendConcurrent]]) found the
  * table changed incompatibly between staging and commit (rebucket,
  * conflicting schema evolution, PK overlap with a concurrent write).
  * The table is UNCHANGED and staging is cleaned up — the caller may
  * simply retry the append against the new state. */
class ConcurrentWriteException(msg: String) extends StoreException(msg)

/** Mirrors reference TypeError conditions (incompatible dtypes). */
class TypeMismatchException(msg: String) extends RuntimeException(msg)
