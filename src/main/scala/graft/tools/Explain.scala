package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Dev utility: print the formatted physical plan of a named query and time
  * its forced execution. Usage:
  *   sbt "runMain graft.tools.Explain <queryName> [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Tables.session("graft-explain",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain] $name forced in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
