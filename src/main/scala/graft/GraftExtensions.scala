package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.graftshim.FunctionRegistration

/** Cluster deployment hook: `--conf spark.sql.extensions=graft.GraftExtensions`
  * injects the engine's native SQL functions into every session on the
  * cluster (the supported `SparkSessionExtensions` seam; for an existing
  * session use `org.apache.spark.sql.graftshim.FunctionRegistration`).
  * Both surfaces iterate the same registry, so they cannot diverge.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    FunctionRegistration.builders.foreach { case (name, usage, b) =>
      ext.injectFunction((new FunctionIdentifier(name),
        FunctionRegistration.info(name, usage), b))
    }
}
