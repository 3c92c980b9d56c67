package graft.tools

/** Builder-side inventory check: prints query/oracle counts and any
  * query lacking an oracle outside the declared rows-only set. */
object Inventory {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"INVENTORY queries=${q.size} oracles=${o.size}")
    val missing = q -- o -- graft.SparkEntry.rowsOnlyQueries
    if (missing.nonEmpty) println(s"MISSING_ORACLE ${missing.toSeq.sorted.mkString(",")}")
    val orphan = o -- q
    if (orphan.nonEmpty) println(s"ORPHAN_ORACLE ${orphan.toSeq.sorted.mkString(",")}")
  }
}
