package graft.tools
object InvCheck {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println("KEYS=" + q.size)
    println("ORACLED=" + (q intersect o).size)
    println("ROWSONLY=" + (q -- o).toSeq.sorted.mkString(","))
    println("ORPHAN_ORACLES=" + (o -- q).toSeq.sorted.mkString(","))
  }
}
