package graft.operators

import org.apache.spark.sql.DataFrame

/** Operators that stage internal working columns (`__salt`, `__bin`,
  * `__k`, …) over caller relations must reject inputs that already use
  * those names — otherwise the staged select/join resolves ambiguously
  * or, worse, silently joins on the caller's column. A loud `require`
  * at the operator boundary beats either failure mode. */
private[graft] object ReservedCols {
  def requireAbsent(df: DataFrame, where: String, names: String*): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"$where: input schema already defines reserved internal column(s) " +
        clash.toSeq.sorted.mkString(", "))
  }
}
