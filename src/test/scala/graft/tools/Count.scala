package graft.tools
import graft.SparkEntry
object Count {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"QUERIES=${q.size} ORACLES=${o.size} RO=${(q -- o).size}")
    println("RO_LIST=" + (q -- o).toSeq.sorted.mkString(","))
    val dangling = o -- q
    println("DANGLING_ORACLES=" + dangling.mkString(","))
  }
}
